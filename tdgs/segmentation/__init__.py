"""Identity-vector segmentation: the fork's core novel capability.

Per-gaussian learnable identity vectors rendered through the N-D feature
path, supervised against 2D instance masks with Contrastive Gaussian
Clustering losses, then clustered into rigid-body groups
(reference: examples/utils.py:744-975, examples/load_identity_encodings.py).
"""

from tdgs.segmentation.head import init_segmentation_head, apply_segmentation_head
from tdgs.segmentation.losses import (
    cgc_contrastive_clustering_loss,
    cgc_spatial_regularizer,
    contrastive_segmentation_loss,
    cluster_quality,
)
from tdgs.segmentation.clustering import (
    kmeans,
    kmeans_identity_encodings_background,
    dbscan_identity_encodings,
)

__all__ = [
    "init_segmentation_head",
    "apply_segmentation_head",
    "cgc_contrastive_clustering_loss",
    "cgc_spatial_regularizer",
    "contrastive_segmentation_loss",
    "cluster_quality",
    "kmeans",
    "kmeans_identity_encodings_background",
    "dbscan_identity_encodings",
]
