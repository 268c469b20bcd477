"""Golden PyTorch reference for parity testing.

An independent CPU PyTorch implementation of the 3M-ASR model math
(WeNet-style conformer + top-1 MoE FFN, arXiv 2005.08100 / 1901.02860),
written so that:

 * `state_dict()` keys match the reference trainer_3m_fix checkpoint
   naming exactly (so it also exercises m3asr_tpu.checkpoint conversion);
 * forward semantics match the reference TRT engine: pos_emb = pe[:T]
   with no rel_shift, key-length masked softmax, masked_fill around the
   conv module, eval-mode BatchNorm, softmax-top1 gating with
   gate_value = max softmax prob.

The parity standard is the reference's own:
torch.allclose(rtol=1e-05, atol=1e-03) on the valid region
(TRTAPI++/python/trt_helper/infer_helper.py:93).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Swish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


def make_pad_mask(lengths: torch.Tensor, max_len: int) -> torch.Tensor:
    pos = torch.arange(max_len).unsqueeze(0)
    return pos >= lengths.unsqueeze(1)


def sub4_len(lengths: torch.Tensor) -> torch.Tensor:
    l1 = (lengths - 3) // 2 + 1
    return (l1 - 3) // 2 + 1


class PositionwiseFeedForward(nn.Module):
    def __init__(self, idim, hidden_units):
        super().__init__()
        self.w_1 = nn.Linear(idim, hidden_units)
        self.activation = Swish()
        self.w_2 = nn.Linear(hidden_units, idim)

    def forward(self, x):
        return self.w_2(self.activation(self.w_1(x)))


class RelPositionMultiHeadedAttention(nn.Module):
    def __init__(self, n_head, n_feat):
        super().__init__()
        assert n_feat % n_head == 0
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_q = nn.Linear(n_feat, n_feat)
        self.linear_k = nn.Linear(n_feat, n_feat)
        self.linear_v = nn.Linear(n_feat, n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.linear_pos = nn.Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = nn.Parameter(torch.Tensor(self.h, self.d_k))
        self.pos_bias_v = nn.Parameter(torch.Tensor(self.h, self.d_k))
        nn.init.xavier_uniform_(self.pos_bias_u)
        nn.init.xavier_uniform_(self.pos_bias_v)

    def forward(self, x, pos_emb, lengths):
        B, T, _ = x.shape
        q = self.linear_q(x).view(B, T, self.h, self.d_k)
        k = self.linear_k(x).view(B, T, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(x).view(B, T, self.h, self.d_k).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(1, -1, self.h, self.d_k)
        p = p.transpose(1, 2)  # (1, H, T, d_k)

        q_u = (q + self.pos_bias_u).transpose(1, 2)  # (B, H, T, d_k)
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        matrix_ac = torch.matmul(q_u, k.transpose(-2, -1))
        matrix_bd = torch.matmul(q_v, p.transpose(-2, -1))
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)

        if lengths is not None:
            mask = make_pad_mask(lengths, T)[:, None, None, :]
            scores = scores.masked_fill(mask, -float("inf"))
        attn = torch.softmax(scores, dim=-1)
        ctx = torch.matmul(attn, v).transpose(1, 2).reshape(B, T, -1)
        return self.linear_out(ctx)


class ConvolutionModule(nn.Module):
    def __init__(self, channels, kernel_size=15, norm="batch_norm",
                 causal=False):
        super().__init__()
        self.pointwise_conv1 = nn.Conv1d(channels, 2 * channels, 1)
        if causal:
            padding = 0
            self.lorder = kernel_size - 1
        else:
            padding = (kernel_size - 1) // 2
            self.lorder = 0
        self.depthwise_conv = nn.Conv1d(channels, channels, kernel_size,
                                        padding=padding, groups=channels)
        self.use_layer_norm = norm == "layer_norm"
        self.norm = (nn.LayerNorm(channels) if self.use_layer_norm
                     else nn.BatchNorm1d(channels))
        self.pointwise_conv2 = nn.Conv1d(channels, channels, 1)
        self.activation = Swish()

    def forward(self, x, lengths):
        x = x.transpose(1, 2)  # (B, C, T)
        if lengths is not None:
            pad = make_pad_mask(lengths, x.size(2))[:, None, :]
            x = x.masked_fill(pad, 0.0)
        if self.lorder > 0:
            x = F.pad(x, (self.lorder, 0))
        x = self.pointwise_conv1(x)
        x = F.glu(x, dim=1)
        if lengths is not None and self.lorder == 0:
            # strict masking mode (see m3asr_tpu.ops.conv.conv_module):
            # zero padded positions before the depthwise conv so batched
            # short utterances match the exact-length behavior. The
            # reference masks only at entry/exit; both agree whenever
            # utterance length == tensor length (the canonical case).
            x = x.masked_fill(pad, 0.0)
        x = self.depthwise_conv(x)
        if self.use_layer_norm:
            x = x.transpose(1, 2)
        x = self.activation(self.norm(x))
        if self.use_layer_norm:
            x = x.transpose(1, 2)
        x = self.pointwise_conv2(x)
        if lengths is not None:
            x = x.masked_fill(pad, 0.0)
        return x.transpose(1, 2)


class Conv2dSubsampling4(nn.Module):
    def __init__(self, idim, odim, in_ch=1):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch, odim, 3, 2), nn.ReLU(),
            nn.Conv2d(odim, odim, 3, 2), nn.ReLU())
        self.out = nn.Sequential(
            nn.Linear(odim * (((idim - 1) // 2 - 1) // 2), odim))
        self.in_ch = in_ch

    def forward(self, x, lengths):
        b, t, f = x.size()
        x = x.view(b, t, self.in_ch, f // self.in_ch).transpose(1, 2)
        x = self.conv(x)
        b, c, t, f = x.size()
        x = self.out[0](x.transpose(1, 2).contiguous().view(b, t, c * f))
        return x, (None if lengths is None else sub4_len(lengths))


class Conv2dSubsampling6(nn.Module):
    def __init__(self, idim, odim, in_ch=1):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch, odim, 3, 2), nn.ReLU(),
            nn.Conv2d(odim, odim, 5, 3), nn.ReLU())
        self.out = nn.Linear(odim * (((idim - 1) // 2 - 2) // 3), odim)
        self.in_ch = in_ch

    def forward(self, x):
        b, t, f = x.size()
        x = x.view(b, t, self.in_ch, f // self.in_ch).transpose(1, 2)
        x = self.conv(x)
        b, c, t, f = x.size()
        return self.out(x.transpose(1, 2).contiguous().view(b, t, c * f))


class Conv2dSubsampling8(nn.Module):
    def __init__(self, idim, odim, in_ch=1):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch, odim, 3, 2), nn.ReLU(),
            nn.Conv2d(odim, odim, 3, 2), nn.ReLU(),
            nn.Conv2d(odim, odim, 3, 2), nn.ReLU())
        self.out = nn.Linear(
            odim * ((((idim - 1) // 2 - 1) // 2 - 1) // 2), odim)
        self.in_ch = in_ch

    def forward(self, x):
        b, t, f = x.size()
        x = x.view(b, t, self.in_ch, f // self.in_ch).transpose(1, 2)
        x = self.conv(x)
        b, c, t, f = x.size()
        return self.out(x.transpose(1, 2).contiguous().view(b, t, c * f))


class RelPositionalEncoding(nn.Module):
    def __init__(self, d_model, max_len=5000):
        super().__init__()
        self.d_model = d_model
        self.xscale = math.sqrt(d_model)
        pe = torch.zeros(max_len, d_model)
        position = torch.arange(0, max_len, dtype=torch.float32).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, d_model, 2, dtype=torch.float32)
            * -(math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.pe = pe.unsqueeze(0)

    def forward(self, x):
        pos_emb = self.pe[:, : x.size(1)]
        return x * self.xscale, pos_emb


class FMoELinear(nn.Module):
    def __init__(self, num_expert, in_feat, out_feat):
        super().__init__()
        self.weight = nn.Parameter(torch.Tensor(num_expert, out_feat,
                                                in_feat))
        nn.init.xavier_uniform_(self.weight, gain=0.5)
        self.bias = nn.Parameter(torch.zeros(num_expert, out_feat))


class Expert(nn.Module):
    def __init__(self, num_experts, idim, hidden_units):
        super().__init__()
        self.w_1 = FMoELinear(num_experts, idim, hidden_units)
        self.w_2 = FMoELinear(num_experts, hidden_units, idim)
        self.activation = Swish()

    def forward_expert(self, x, e):
        h = F.linear(x, self.w_1.weight[e], self.w_1.bias[e])
        h = self.activation(h)
        return F.linear(h, self.w_2.weight[e], self.w_2.bias[e])


class LocalFmoeCatEmbedFeedForward(nn.Module):
    def __init__(self, idim, embed_dim, num_experts, hidden_units,
                 router_with_bias=False):
        super().__init__()
        self.num_experts = num_experts
        self.experts = Expert(num_experts, idim, hidden_units)
        self.router_weights = nn.Parameter(
            torch.zeros(idim + embed_dim, num_experts))
        if router_with_bias:
            self.router_bias = nn.Parameter(torch.zeros(num_experts))
        else:
            self.router_bias = None

    def forward(self, x, embed, lengths):
        router_in = torch.cat([embed, x], dim=-1)
        logits = torch.einsum("btj,jk->btk", router_in, self.router_weights)
        if self.router_bias is not None:
            logits = logits + self.router_bias
        probs = torch.softmax(logits, dim=-1)
        gate_value, gate_idx = probs.max(dim=-1)  # (B, T)
        B, T, D = x.shape
        flat_x = x.reshape(-1, D)
        flat_e = gate_idx.reshape(-1)
        out = torch.zeros_like(flat_x)
        for e in range(self.num_experts):
            sel = flat_e == e
            if sel.any():
                out[sel] = self.experts.forward_expert(flat_x[sel], e)
        out = out.reshape(B, T, D) * gate_value.unsqueeze(-1)
        if lengths is not None:
            pad = make_pad_mask(lengths, T)[:, :, None]
            out = out.masked_fill(pad, 0.0)
        return out


class ConformerEncoderLayer(nn.Module):
    def __init__(self, size, heads, ffn_hidden, cnn_kernel=15,
                 cnn_norm="batch_norm", causal=False, macaron=True,
                 use_cnn=True, moe=False, embed_dim=0, num_experts=0,
                 moe_hidden=0, moe_macaron=False):
        super().__init__()
        self.self_attn = RelPositionMultiHeadedAttention(heads, size)
        if moe:
            self.feed_forward = LocalFmoeCatEmbedFeedForward(
                size, embed_dim, num_experts, moe_hidden)
        else:
            self.feed_forward = PositionwiseFeedForward(size, ffn_hidden)
        self.moe = moe
        self.moe_macaron = moe_macaron
        self.macaron = macaron
        self.use_cnn = use_cnn
        self.norm_ff = nn.LayerNorm(size, eps=1e-12)
        self.norm_mha = nn.LayerNorm(size, eps=1e-12)
        if macaron:
            if moe_macaron:
                self.feed_forward_macaron = LocalFmoeCatEmbedFeedForward(
                    size, embed_dim, num_experts, moe_hidden)
            else:
                self.feed_forward_macaron = PositionwiseFeedForward(
                    size, ffn_hidden)
            self.norm_ff_macaron = nn.LayerNorm(size, eps=1e-12)
            self.ff_scale = 0.5
        else:
            self.ff_scale = 1.0
        if use_cnn:
            self.conv_module = ConvolutionModule(size, cnn_kernel, cnn_norm,
                                                 causal)
            self.norm_conv = nn.LayerNorm(size, eps=1e-12)
            self.norm_final = nn.LayerNorm(size, eps=1e-12)

    def forward(self, x, lengths, pos_emb, embed=None):
        if self.macaron:
            h = self.norm_ff_macaron(x)
            if self.moe_macaron:
                h = self.feed_forward_macaron(h, embed, lengths)
            else:
                h = self.feed_forward_macaron(h)
            x = x + self.ff_scale * h
        x = x + self.self_attn(self.norm_mha(x), pos_emb, lengths)
        if self.use_cnn:
            x = x + self.conv_module(self.norm_conv(x), lengths)
        h = self.norm_ff(x)
        if self.moe:
            x = x + self.ff_scale * self.feed_forward(h, embed, lengths)
        else:
            x = x + self.ff_scale * self.feed_forward(h)
        if self.use_cnn:
            x = self.norm_final(x)
        return x


class DenseConformer(nn.Module):
    """Golden twin of conformer_embed_domain_acc.Net / conformer2.Net."""

    def __init__(self, input_dim, output_dim, attention_dim=256,
                 attention_heads=4, linear_units=2048, num_blocks=6,
                 cnn_module_kernel=15, cnn_module_norm="batch_norm",
                 causal=False):
        super().__init__()
        self.subsampling = Conv2dSubsampling4(input_dim, attention_dim)
        self.pos_enc = RelPositionalEncoding(attention_dim)
        self.blocks = nn.ModuleList([
            ConformerEncoderLayer(attention_dim, attention_heads,
                                  linear_units, cnn_module_kernel,
                                  cnn_module_norm, causal)
            for _ in range(num_blocks)])
        self.after_norm = nn.LayerNorm(attention_dim, eps=1e-12)
        self.out_linear = nn.Linear(attention_dim, output_dim)

    def forward(self, xs, xs_len, output_embed=False):
        xs, xs_len = self.subsampling(xs, xs_len)
        xs, pos_emb = self.pos_enc(xs)
        for layer in self.blocks:
            xs = layer(xs, xs_len, pos_emb)
        xs = self.after_norm(xs)
        out = self.out_linear(xs)
        if output_embed:
            return out, xs_len, xs
        return out, xs_len


class HierMoEConformer(nn.Module):
    """Golden twin of conformer_fmoe_localComm_catEmbed_domain_acc_hier.Net
    (inference path)."""

    def __init__(self, input_dim, output_dim, attention_dim=256,
                 attention_heads=4, num_blocks=12, num_experts=4,
                 moe_hidden=1024, embed_conf=None,
                 cnn_module_kernel=15, cnn_module_norm="batch_norm"):
        super().__init__()
        embed_conf = embed_conf or {}
        self.embed = DenseConformer(input_dim, output_dim, **embed_conf)
        embed_dim = embed_conf.get("attention_dim", 256)
        self.subsampling = Conv2dSubsampling4(input_dim, attention_dim)
        self.pos_enc = RelPositionalEncoding(attention_dim)
        self.blocks = nn.ModuleList([
            ConformerEncoderLayer(
                attention_dim, attention_heads, moe_hidden,
                cnn_module_kernel, cnn_module_norm, moe=True,
                embed_dim=embed_dim, num_experts=num_experts,
                moe_hidden=moe_hidden)
            for _ in range(num_blocks)])
        self.after_norm = nn.LayerNorm(attention_dim, eps=1e-12)
        self.after_norm_6 = nn.LayerNorm(attention_dim, eps=1e-12)
        self.after_norm_12 = nn.LayerNorm(attention_dim, eps=1e-12)
        self.out_linear = nn.Linear(attention_dim, output_dim)

    def forward(self, xs, xs_len):
        _, _, embed = self.embed(xs, xs_len, output_embed=True)
        x, x_len = self.subsampling(xs, xs_len)
        x, pos_emb = self.pos_enc(x)
        for layer in self.blocks:
            x = layer(x, x_len, pos_emb, embed=embed)
        x = self.after_norm(x)
        return self.out_linear(x), x_len


class MultiHeadedAttention(nn.Module):
    """Plain MHA with a boolean attend-mask (True=attend)."""

    def __init__(self, n_head, n_feat):
        super().__init__()
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_q = nn.Linear(n_feat, n_feat)
        self.linear_k = nn.Linear(n_feat, n_feat)
        self.linear_v = nn.Linear(n_feat, n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)

    def forward(self, q_in, k_in, v_in, mask):
        B, T1 = q_in.shape[:2]
        T2 = k_in.shape[1]
        q = self.linear_q(q_in).view(B, T1, self.h, self.d_k).transpose(1, 2)
        k = self.linear_k(k_in).view(B, T2, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(v_in).view(B, T2, self.h, self.d_k).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(self.d_k)
        if mask is not None:
            scores = scores.masked_fill(~mask, -float("inf"))
            attn = torch.softmax(scores, dim=-1).masked_fill(~mask, 0.0)
        else:
            attn = torch.softmax(scores, dim=-1)
        x = torch.matmul(attn, v).transpose(1, 2).reshape(B, T1, -1)
        return self.linear_out(x)


class DecoderFFN(nn.Module):
    def __init__(self, d, hidden):
        super().__init__()
        self.w_1 = nn.Linear(d, hidden)
        self.w_2 = nn.Linear(hidden, d)

    def forward(self, x):
        return self.w_2(torch.relu(self.w_1(x)))


class DecoderLayer(nn.Module):
    def __init__(self, size, heads, hidden):
        super().__init__()
        self.self_attn = MultiHeadedAttention(heads, size)
        self.src_attn = MultiHeadedAttention(heads, size)
        self.feed_forward = DecoderFFN(size, hidden)
        self.norm1 = nn.LayerNorm(size, eps=1e-12)
        self.norm2 = nn.LayerNorm(size, eps=1e-12)
        self.norm3 = nn.LayerNorm(size, eps=1e-12)

    def forward(self, x, tgt_mask, memory, memory_mask):
        x = x + self.self_attn(self.norm1(x), self.norm1(x), self.norm1(x),
                               tgt_mask)
        x = x + self.src_attn(self.norm2(x), memory, memory, memory_mask)
        x = x + self.feed_forward(self.norm3(x))
        return x


class TransformerDecoder(nn.Module):
    """Golden twin of att_decoder.TransformerDecoder (pre-norm)."""

    def __init__(self, vocab_size, d_model, attention_heads=4,
                 linear_units=64, num_blocks=2):
        super().__init__()
        self.embed = nn.Sequential(nn.Embedding(vocab_size, d_model))
        self.pe = RelPositionalEncoding(d_model)  # same sinusoid table
        self.xscale = math.sqrt(d_model)
        self.decoders = nn.ModuleList([
            DecoderLayer(d_model, attention_heads, linear_units)
            for _ in range(num_blocks)])
        self.after_norm = nn.LayerNorm(d_model, eps=1e-12)
        self.output_layer = nn.Linear(d_model, vocab_size)

    def forward(self, memory, memory_lens, ys_in, ys_in_lens):
        B, U = ys_in.shape
        x = self.embed[0](ys_in) * self.xscale + self.pe.pe[:, :U]
        sub = torch.tril(torch.ones(U, U, dtype=torch.bool))
        pad = ~make_pad_mask(ys_in_lens, U)
        tgt_mask = (sub[None] & pad[:, None, :])[:, None]  # (B,1,U,U)
        mem_mask = ~make_pad_mask(memory_lens, memory.shape[1])
        mem_mask = mem_mask[:, None, None, :]
        for layer in self.decoders:
            x = layer(x, tgt_mask, memory, mem_mask)
        x = self.after_norm(x)
        return self.output_layer(x)

    def state_dict_ref_names(self):
        """state_dict with reference naming (embed.0 + pe dropped)."""
        return self.state_dict()


class CFSMNLayer(nn.Module):
    """Golden compact-FSMN layer (dfsmn_base_res.py semantics): strided
    FIR memory via symmetric-pad conv + crop."""

    def __init__(self, input_dim, hid_dim, mem_dim, look_back=4,
                 look_ahead=1, stride_left=2, stride_right=1,
                 skip_connect=False, upper_bound=None):
        super().__init__()
        self.look_back, self.look_ahead = look_back, look_ahead
        self.stride_left, self.stride_right = stride_left, stride_right
        self.skip_connect, self.upper_bound = skip_connect, upper_bound
        self.mem_dim = mem_dim
        self.left_factor = nn.Parameter(torch.zeros(look_back, mem_dim))
        self.cur_factor = nn.Parameter(torch.zeros(1, mem_dim))
        self.right_factor = nn.Parameter(torch.zeros(look_ahead, mem_dim))
        self.hid_proj = nn.Linear(input_dim, hid_dim)
        self.mem_proj = nn.Linear(hid_dim, mem_dim, bias=False)

    def forward(self, x, lengths):
        hid = torch.relu(self.hid_proj(x))
        if self.upper_bound is not None:
            hid = torch.clamp(hid, max=self.upper_bound)
        p = self.mem_proj(hid)
        if self.skip_connect:
            p = p + x
        mask = ~make_pad_mask(lengths, x.size(1))
        p = p * mask.unsqueeze(-1).float()
        lctx = self.look_back * self.stride_left
        rctx = self.look_ahead * self.stride_right
        f = p.new_zeros(lctx + 1 + rctx, self.mem_dim)
        f[0:lctx:self.stride_left] = self.left_factor
        f[lctx] = self.cur_factor[0]
        f[lctx + self.stride_right::self.stride_right] = self.right_factor
        w = f.t().unsqueeze(1)  # (D, 1, K)
        pad = max(lctx, rctx)
        conv = F.conv1d(p.transpose(1, 2), w, padding=pad,
                        groups=self.mem_dim)
        lo = max(0, pad - lctx)
        hi = min(0, rctx - pad)
        conv = conv[:, :, lo: conv.size(2) + hi]
        return conv.transpose(1, 2) + p


class AttnMemLayer(nn.Module):
    """Golden MultiHeadAttnMemLayer (attention.py:11-111)."""

    def __init__(self, model_dim, head_num, memory_num=0):
        super().__init__()
        self.h, self.m = head_num, memory_num
        self.dk = model_dim // head_num
        if memory_num > 0:
            self.key_memory = nn.Parameter(
                torch.zeros(head_num, memory_num, self.dk))
            self.value_memory = nn.Parameter(
                torch.zeros(head_num, memory_num, self.dk))
        self.linear_query = nn.Linear(model_dim, model_dim, bias=False)
        self.linear_key = nn.Linear(model_dim, model_dim, bias=False)
        self.linear_value = nn.Linear(model_dim, model_dim, bias=False)
        self.linear_out = nn.Linear(model_dim, model_dim, bias=False)

    def forward(self, x, lengths):
        B, T, D = x.shape
        def shape(t):
            return t.view(B, T, self.h, self.dk).transpose(1, 2) \
                    .reshape(B * self.h, T, self.dk)
        k = shape(self.linear_key(x))
        v = shape(self.linear_value(x))
        q = shape(self.linear_query(x))
        if self.m > 0:
            k = torch.cat([k, self.key_memory.repeat(B, 1, 1)], dim=1)
            v = torch.cat([v, self.value_memory.repeat(B, 1, 1)], dim=1)
        score = torch.bmm(q, k.transpose(1, 2)) / math.sqrt(self.dk)
        mask = make_pad_mask(lengths, T)  # (B, T) True=pad
        if self.m > 0:
            mask = torch.cat([mask, mask.new_zeros(B, self.m)], dim=1)
        score = score.view(B, self.h, T, -1).masked_fill(
            mask[:, None, None, :], -float("inf")).view(B * self.h, T, -1)
        attn = torch.softmax(score, dim=-1)
        out = torch.bmm(attn, v).view(B, self.h, T, self.dk) \
                   .transpose(1, 2).reshape(B, T, D)
        return self.linear_out(out)


class DfsmnSanNet(nn.Module):
    """Golden twin of model/dfsmn_san_res.py Net (LN norm type)."""

    def __init__(self, input_dim, output_dim, num_block=2,
                 fsmn_each_block=3, hidden_dim=32, memory_dim=16,
                 look_back=4, look_ahead=1, stride_left=2, stride_right=1,
                 num_head=4, num_memory=8):
        super().__init__()
        self.num_block, self.fsmn_each_block = num_block, fsmn_each_block
        self.memory_dim = memory_dim
        self.num_head, self.num_memory = num_head, num_memory
        pe_mod = RelPositionalEncoding(memory_dim)
        self.pe = pe_mod.pe
        blocks = []
        in_dim = input_dim
        for i in range(num_block):
            fsmn = nn.ModuleList()
            for j in range(fsmn_each_block):
                first = i == 0 and j == 0
                fsmn.append(CFSMNLayer(
                    in_dim if j == 0 else memory_dim, hidden_dim,
                    memory_dim, look_back, look_ahead, stride_left,
                    stride_right, skip_connect=not first,
                    upper_bound=None if first else 1.0))
            attn = nn.Module()
            attn.attn_layer = AttnMemLayer(memory_dim, num_head, num_memory)
            attn.ln_layer = nn.LayerNorm(memory_dim)
            blk = nn.Module()
            blk.fsmn_layers = fsmn
            blk.attn_layer = attn
            blocks.append(blk)
            in_dim = memory_dim
        self.blocks = nn.ModuleList(blocks)
        self.out_linear = nn.Linear(memory_dim, output_dim)

    def forward(self, x, lengths):
        for i, blk in enumerate(self.blocks):
            for f in blk.fsmn_layers:
                x = f(x, lengths)
            if i == 0:
                x = x + self.pe[:, : x.size(1)]
            a = blk.attn_layer
            x = a.ln_layer(x + a.attn_layer(x, lengths))
        return self.out_linear(x), lengths


class DfsmnSanDomainAccNet(DfsmnSanNet):
    """Golden twin of model/dfsmn_san_res_embed_domain_acc.py Net: the
    san stack plus mean-pooled domain/accent heads (:249-279). Pooling
    is the reference's plain torch.mean over padded T (no length mask)."""

    def __init__(self, *args, output_dim_domain=6, output_dim_acc=8,
                 **kwargs):
        super().__init__(*args, **kwargs)
        d = self.memory_dim
        self.out_linear_domain = nn.Linear(d, output_dim_domain)
        self.out_linear_accent = nn.Linear(d, output_dim_acc)
        self.out_linear_domain_embed = nn.Linear(d, d)
        self.out_linear_accent_embed = nn.Linear(d, d)

    def forward(self, x, lengths, output_embed=False):
        for i, blk in enumerate(self.blocks):
            for f in blk.fsmn_layers:
                x = f(x, lengths)
            if i == 0:
                x = x + self.pe[:, : x.size(1)]
            a = blk.attn_layer
            x = a.ln_layer(x + a.attn_layer(x, lengths))
        x_domain = self.out_linear_domain_embed(x)
        x_acc = self.out_linear_accent_embed(x)
        x_pool_domain = torch.mean(x_domain, 1, True)
        x_pool_acc = torch.mean(x_acc, 1, True)
        out_pool = self.out_linear_domain(x_pool_domain)
        out_pool_acc = self.out_linear_accent(x_pool_acc)
        out = self.out_linear(x)
        if output_embed:
            x_cat_2 = torch.cat(
                (x, x_pool_domain.expand(-1, x.shape[1], -1),
                 x_pool_acc.expand(-1, x.shape[1], -1)), dim=-1)
            return out, out_pool, out_pool_acc, x_cat_2, lengths
        return out, out_pool, out_pool_acc, lengths


class CFSMNMoELayer(nn.Module):
    """Golden MoE cFSMN layer (dfsmn_base_fmoe_localComm_catEmbed.py):
    top-1 gate on cat[embed, x] -> per-expert {hid_proj -> relu ->
    clamp -> mem_proj(no bias)} -> *gate -> +x -> mask -> FIR + p."""

    def __init__(self, dim, embed_dim, hid_dim, num_experts, look_back=4,
                 look_ahead=1, stride_left=2, stride_right=1,
                 upper_bound=1.0):
        super().__init__()
        self.num_experts = num_experts
        self.upper_bound = upper_bound
        self.experts = nn.Module()
        self.experts.hid_proj = FMoELinear(num_experts, dim, hid_dim)
        self.experts.mem_proj = nn.Module()
        self.experts.mem_proj.weight = nn.Parameter(
            torch.zeros(num_experts, dim, hid_dim))
        nn.init.xavier_uniform_(self.experts.mem_proj.weight, gain=0.5)
        self.rooter_weights = nn.Parameter(
            torch.zeros(embed_dim + dim, num_experts))
        self.left_factor = nn.Parameter(torch.zeros(look_back, dim))
        self.cur_factor = nn.Parameter(torch.zeros(1, dim))
        self.right_factor = nn.Parameter(torch.zeros(look_ahead, dim))

    def forward(self, x, embed, lengths):
        B, T, D = x.shape
        router_in = torch.cat([embed, x], dim=-1)
        logits = torch.einsum("btj,jk->btk", router_in, self.rooter_weights)
        probs = torch.softmax(logits, -1)
        gate_value, gate_idx = probs.max(dim=-1)
        flat_x = x.reshape(-1, D)
        flat_e = gate_idx.reshape(-1)
        out = torch.zeros_like(flat_x)
        for e in range(self.num_experts):
            sel = flat_e == e
            if sel.any():
                h = F.linear(flat_x[sel], self.experts.hid_proj.weight[e],
                             self.experts.hid_proj.bias[e])
                h = torch.relu(h).clamp(max=self.upper_bound)
                out[sel] = F.linear(h, self.experts.mem_proj.weight[e])
        y = out.reshape(B, T, D) * gate_value.unsqueeze(-1)
        p = y + x
        mask = ~make_pad_mask(lengths, T)
        p = p * mask.unsqueeze(-1).float()
        # FIR (same math as CFSMNLayer tail)
        lb, la, sl, sr = 4, 1, 2, 1
        lctx, rctx = lb * sl, la * sr
        f = p.new_zeros(lctx + 1 + rctx, D)
        f[0:lctx:sl] = self.left_factor
        f[lctx] = self.cur_factor[0]
        f[lctx + sr::sr] = self.right_factor
        w = f.t().unsqueeze(1)
        pad = max(lctx, rctx)
        conv = F.conv1d(p.transpose(1, 2), w, padding=pad, groups=D)
        lo = max(0, pad - lctx)
        hi = min(0, rctx - pad)
        conv = conv[:, :, lo: conv.size(2) + hi]
        return conv.transpose(1, 2) + p


def randomize_(model: nn.Module, seed: int = 0):
    """Give every parameter (incl. BN running stats) a non-degenerate
    random value so parity tests are meaningful."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()
    return model
