"""TPU kernel tier (Pallas) — the framework's "native" layer.

The reference has no native code at all (SURVEY.md §2.3); what Julia gets
from OpenBLAS/LAPACK at L0, the TPU build gets from XLA plus the fused
Pallas kernels in this package (Gram construction, batched small Cholesky)."""

from . import gram
from .gram import pallas_stationary_gram
from .gram_matvec import pallas_gram_matvec
