from .analytic import DatasetPosteriorDenoiser, GaussianDenoiser
