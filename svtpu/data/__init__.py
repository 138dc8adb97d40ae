from svtpu.data.segments import assign_label, split_segments, SplitIndices
from svtpu.data.pairs import build_pairs
