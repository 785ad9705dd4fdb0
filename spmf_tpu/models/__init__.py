from .base import BayesianModel, load_model
from .poisson import PoissonFactorization
from .bernoulli import BernoulliFactorization
from .gaussian import GaussianFactorization
from .mixed import MixedFactorization
from .autoencoder import PoissonAutoencoder
from .legacy import PoissonMatrixFactorization

__all__ = [
    "BayesianModel",
    "load_model",
    "PoissonFactorization",
    "BernoulliFactorization",
    "GaussianFactorization",
    "MixedFactorization",
    "PoissonAutoencoder",
    "PoissonMatrixFactorization",
]
