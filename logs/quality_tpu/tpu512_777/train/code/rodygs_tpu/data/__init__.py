from .datamodule import DataReader, GSDataModule, LazyDataReader  # noqa: F401
from .points import BasicPointCloud  # noqa: F401
