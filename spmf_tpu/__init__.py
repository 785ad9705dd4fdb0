"""spmf_tpu — TPU-native sparse probabilistic matrix factorization.

A ground-up JAX/XLA/Pallas rebuild of mederrata/spmf (and the external
``bayesianquilts`` inference engine it depends on), designed TPU-first:
jitted minibatch ADVI, mesh-sharded batches/parameters, Pallas kernels for
the fused Poisson-likelihood hot path.

Public surface mirrors the reference package ``mederrata_spmf``
(reference: mederrata_spmf/__init__.py:1-3 exports PoissonFactorization,
PoissonAutoencoder, BernoulliFactorization), plus the components the
reference defined but never exported/implemented (GaussianFactorization,
MixedFactorization) and the legacy ``PoissonMatrixFactorization`` name used
by its scripts/notebooks.
"""

__version__ = "0.1.0"

from spmf_tpu import bijectors, distributions  # noqa: F401
from spmf_tpu.models import (  # noqa: F401
    BayesianModel,
    load_model,
    BernoulliFactorization,
    GaussianFactorization,
    MixedFactorization,
    PoissonAutoencoder,
    PoissonFactorization,
    PoissonMatrixFactorization,
)

__all__ = [
    "distributions",
    "bijectors",
    "BayesianModel",
    "load_model",
    "PoissonFactorization",
    "PoissonAutoencoder",
    "BernoulliFactorization",
    "GaussianFactorization",
    "MixedFactorization",
    "PoissonMatrixFactorization",
    "__version__",
]
