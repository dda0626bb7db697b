from .chamfer_kernel import chamfer_pallas, nn_distance_pallas
from .emd_kernel import emd_cost_pallas
