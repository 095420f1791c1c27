from .clip_score import clip_score, make_hf_clip_encoders
from .dataset import ImageFolderDataset
from .fid import (FIDAccumulator, calculate_stats, compute_fid, load_stats,
                  make_inception_feature_fn, save_stats)
from .inception import FEATURE_DIM, InceptionV3FID, import_inception_state_dict
from .prdc import compute_prdc, knn_radii, pairwise_distances
