from .layers import SharedDot, torch_linear_kernel_init, torch_linear_bias_init
