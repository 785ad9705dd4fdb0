from .base import BayesianModel
from .poisson import PoissonFactorization
from .bernoulli import BernoulliFactorization
from .gaussian import GaussianFactorization
from .mixed import MixedFactorization
from .autoencoder import PoissonAutoencoder
from .legacy import PoissonMatrixFactorization

__all__ = [
    "BayesianModel",
    "PoissonFactorization",
    "BernoulliFactorization",
    "GaussianFactorization",
    "MixedFactorization",
    "PoissonAutoencoder",
    "PoissonMatrixFactorization",
]
