"""DFSMN family parity tests."""

import numpy as np
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.models import dfsmn

from test_op_parity import allclose, valid_region


def test_cfsmn_layer_parity():
    torch.manual_seed(60)
    m = G.randomize_(G.CFSMNLayer(16, 24, 16, look_back=4, look_ahead=1,
                                  stride_left=2, stride_right=1,
                                  skip_connect=True, upper_bound=1.0),
                     seed=61)
    g = torch.Generator().manual_seed(62)
    x = torch.randn(2, 19, 16, generator=g)
    lengths = torch.tensor([19, 11])
    with torch.no_grad():
        y_t = m(x, lengths)
    p = ckpt._to_jax(ckpt.convert_cfsmn(StateDict(m.state_dict())))
    cfg = dfsmn.FsmnConfig(4, 1, 2, 1, upper_bound=1.0, skip_connect=True)
    y_j = dfsmn.cfsmn_layer(p, jnp.asarray(x.numpy()), jnp.array([19, 11]),
                            cfg)
    allclose(valid_region(y_j, [19, 11]), valid_region(y_t.numpy(), [19, 11]))


def test_attn_mem_layer_parity():
    torch.manual_seed(63)
    m = G.randomize_(G.AttnMemLayer(16, 4, memory_num=8), seed=64)
    g = torch.Generator().manual_seed(65)
    x = torch.randn(2, 9, 16, generator=g)
    lengths = torch.tensor([9, 5])
    with torch.no_grad():
        y_t = m(x, lengths)
    p = ckpt._to_jax(ckpt.convert_attn_mem(StateDict(m.state_dict())))
    y_j = dfsmn.attn_mem_layer(p, jnp.asarray(x.numpy()),
                               jnp.array([9, 5]), num_heads=4, memory_num=8)
    allclose(valid_region(y_j, [9, 5]), valid_region(y_t.numpy(), [9, 5]))


def test_dfsmn_san_net_parity():
    torch.manual_seed(66)
    m = G.randomize_(G.DfsmnSanNet(12, 7, num_block=2, fsmn_each_block=3,
                                   hidden_dim=24, memory_dim=16,
                                   num_head=4, num_memory=8), seed=67)
    g = torch.Generator().manual_seed(68)
    x = torch.randn(2, 23, 12, generator=g)
    lengths = torch.tensor([23, 14])
    with torch.no_grad():
        y_t, _ = m(x, lengths)
    p = ckpt.convert_dfsmn_san(StateDict(m.state_dict()), num_block=2,
                               fsmn_each_block=3)
    cfg = dfsmn.DfsmnSanConfig(num_block=2, fsmn_each_block=3,
                               hidden_dim=24, memory_dim=16, num_head=4,
                               num_memory=8)
    y_j, _ = dfsmn.dfsmn_san_forward(p, cfg, jnp.asarray(x.numpy()),
                                     jnp.array([23, 14]))
    allclose(valid_region(y_j, [23, 14]), valid_region(y_t.numpy(), [23, 14]))


def test_dfsmn_san_domain_acc_parity():
    """dfsmn_san_res_embed_domain_acc Net: san stack + mean-pooled
    domain/accent heads + x_cat_2 conditioning feature (:249-279).
    Parity vs the golden twin is pinned at zero padding (lengths == T),
    where our masked-mean pooling coincides with the reference's plain
    torch.mean; a separate check asserts the pooled heads are
    padding-invariant (the reference's are not — its pooled logits
    change with batch padding, which engine bucket padding forbids)."""
    import jax
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models.registry import get_family

    torch.manual_seed(70)
    m = G.randomize_(G.DfsmnSanDomainAccNet(
        12, 7, num_block=2, fsmn_each_block=3, hidden_dim=24,
        memory_dim=16, num_head=4, num_memory=8, output_dim_domain=5,
        output_dim_acc=3), seed=71)
    g = torch.Generator().manual_seed(72)
    x = torch.randn(2, 23, 12, generator=g)
    lengths = torch.tensor([23, 23])        # zero padding: exact parity
    with torch.no_grad():
        out_t, dom_t, acc_t, cat_t, _ = m(x, lengths, output_embed=True)

    yaml = {"nnet_proto": "dfsmn_san_res_embed_domain_acc",
            "input_dim": 12, "output_dim": 7,
            "model_conf": {"num_block": 2, "fsmn_each_block": 3,
                           "hidden_dim": 24, "memory_dim": 16,
                           "num_head": 4, "num_memory": 8,
                           "output_dim_domain": 5, "output_dim_acc": 3}}
    mc = model_config_from_dict(yaml)
    fam = get_family(mc.nnet_proto)

    sd = ckpt.track(dict(m.state_dict()))
    p = fam.convert(sd, mc)
    assert not ckpt.unconsumed_keys(sd), ckpt.unconsumed_keys(sd)

    xj, lj = jnp.asarray(x.numpy()), jnp.array([23, 23])
    out_j, _, dom_j, acc_j = fam.forward(p, mc, xj, lj, domain_acc=True)
    allclose(out_j, out_t.numpy())
    allclose(dom_j, dom_t.numpy())
    allclose(acc_j, acc_t.numpy())

    out_j2, _, cat_j, dom_j2, acc_j2 = fam.forward(
        p, mc, xj, lj, output_embed=True, domain_acc=True)
    allclose(cat_j, cat_t.numpy())
    allclose(dom_j2, dom_t.numpy())

    # engine hidden contract: (out, lens, hidden)
    out_j3, _, hid = fam.forward(p, mc, xj, lj, output_embed=True)
    np.testing.assert_array_equal(np.asarray(hid), np.asarray(cat_j))

    # padding invariance: the same utterance padded to a longer bucket
    # gives the SAME pooled logits (masked mean; engine buckets rely
    # on this)
    xs, ls = jnp.asarray(x.numpy()[:1, :20]), jnp.array([20])
    _, _, dom_a, acc_a = fam.forward(p, mc, xs, ls, domain_acc=True)
    xpad = jnp.pad(xs, ((0, 0), (0, 17), (0, 0)))
    _, _, dom_b, acc_b = fam.forward(p, mc, xpad, ls, domain_acc=True)
    np.testing.assert_allclose(np.asarray(dom_a), np.asarray(dom_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_a), np.asarray(acc_b),
                               rtol=1e-5, atol=1e-5)

    # init matches the converted tree's structure (trainable from here)
    pi = fam.init(jax.random.PRNGKey(0), mc)
    assert (jax.tree_util.tree_structure(pi)
            == jax.tree_util.tree_structure(p))
    for a, b in zip(jax.tree_util.tree_leaves(pi),
                    jax.tree_util.tree_leaves(p)):
        assert a.shape == b.shape, (a.shape, b.shape)
