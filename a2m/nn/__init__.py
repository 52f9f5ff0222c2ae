from a2m.nn.encoders import (AudioEncoder, AudioEncoder1D, ClusterClassify,
                             LatentEncoder, PoseDecoder, PoseEncoder,
                             PoseStyleEncoder, StyleDecoder, TextEncoder1D,
                             UNet1D, UNet1DFirstVersion)
from a2m.nn.graph import DenseGATConv, DenseGraphConv, GCNStack
from a2m.nn.layers import (ChannelAttention, ConvNormRelu, ConvTranspose1D,
                           ResBlock, SelfAttention, interpolate_bilinear,
                           next_multiple_power_of_two, num_powers_of_two,
                           torch_pad)
from a2m.nn.misc import (BatchGroup, Confidence, Curriculum, EmbLin, Group,
                         Style, index_select_outputs, repeat_interleave,
                         transpose)

__all__ = [
    'AudioEncoder', 'AudioEncoder1D', 'ClusterClassify', 'LatentEncoder',
    'PoseDecoder', 'PoseEncoder', 'PoseStyleEncoder', 'StyleDecoder',
    'TextEncoder1D', 'UNet1D', 'UNet1DFirstVersion', 'DenseGATConv',
    'DenseGraphConv', 'GCNStack', 'ChannelAttention', 'ConvNormRelu',
    'ConvTranspose1D', 'ResBlock', 'SelfAttention', 'interpolate_bilinear',
    'next_multiple_power_of_two', 'num_powers_of_two', 'torch_pad',
    'BatchGroup', 'Confidence', 'Curriculum', 'EmbLin', 'Group', 'Style',
    'index_select_outputs', 'repeat_interleave', 'transpose',
]
