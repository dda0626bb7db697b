from .evaluation import (
    EMD_CD_F1,
    pairwise_EMD_CD_F1,
    knn_two_sample,
    lgan_mmd_cov,
    compute_all_metrics,
    jsd_between_point_cloud_sets,
    voxel_jsd,
    f_score,
)
