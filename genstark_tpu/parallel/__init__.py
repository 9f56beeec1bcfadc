from .mesh import make_mesh
from .ntt_dist import distributed_ntt, distributed_intt
