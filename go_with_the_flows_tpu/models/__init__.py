from .flows import (
    CondAffineCoupling3D,
    PointDecoderFlow,
    LatentAffineCoupling,
    LatentPriorFlow,
    point_decoder_param_count,
)
