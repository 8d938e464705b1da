from . import (laplacian, smoothers, sparse, stencils_aligned,  # noqa: F401
               transfer)
