from .cem_sampler import CEMSampler
from .gaussian_sampler import GaussianCEMSampler
