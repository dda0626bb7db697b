from .chamfer_kernel import chamfer_pallas
from .emd_kernel import emd_cost_pallas
