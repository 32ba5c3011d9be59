"""Data layer: H5 contract, offline preprocessing, device-resident pipeline."""

from .pipeline import DeviceDataset, build_dataset  # noqa: F401
from .preprocess import Preprocessor  # noqa: F401
from .synthetic import make_synthetic_arrays, write_synthetic_h5  # noqa: F401
