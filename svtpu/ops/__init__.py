from svtpu.ops.binarize import binary_concrete, gumbel_softmax_binary
from svtpu.ops import losses
