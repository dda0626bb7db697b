from .cloud_sampling import sample_cloud
from .datasets import ShapeNetCoreDataset, ShapeNetAllDataset
from .cloud_transforms import ComposeCloudTransformation
from .image_transforms import ComposeImageTransformation
from .loader import DataLoader
