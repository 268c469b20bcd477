"""TPU-native op library.

Every custom CUDA TensorRT plugin in the reference
(/root/reference/TRTAPI++/plugin/) maps to a function here:

==============================  =========================================
reference plugin                m3asr_tpu op
==============================  =========================================
FMoEExpertPluginDynamic         ops.moe.moe_experts (+ moe_ffn)
SoftmaxTopKPluginDynamic        ops.moe.softmax_top1_gate
AttMaskedSoftmaxPluginDynamic   ops.attention.masked_softmax
LayerNormPluginDynamic          ops.common.layer_norm
MaskedFillPluginDynamic         ops.masking.masked_fill
MaskConv2dSamplePluginDynamic   ops.masking.conv_subsampled_length
RelPositionalEncodingPluginDyn  ops.positional.rel_positional_encoding
GluPluginDynamic                ops.conv.glu
DumpTensorPluginDynamic         jax.debug.print (ops.common.dump_tensor)
CeluPluginDynamic               jax.nn.celu
AttStreamSoftmaxPluginDynamic   models.streaming._stream_rel_mha (windowed key_valid mask)
CatSplitCachePluginDynamic      models.streaming fixed-shape KV/conv caches
cmvn_plugin (incomplete)        frontend.features.apply_cmvn
==============================  =========================================
"""

from m3asr_tpu.ops import attention, common, conv, masking, moe, positional, subsampling  # noqa: F401
