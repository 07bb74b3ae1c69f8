from .mesh import make_mesh, default_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    sharded_sig_kernel,
    sharded_sig_gram,
    sharded_sig_gram_2d,
    sharded_sig_gram_lincomb,
    sharded_sig_mmd,
)
from .seq_stripes import striped_solve_final  # noqa: F401
