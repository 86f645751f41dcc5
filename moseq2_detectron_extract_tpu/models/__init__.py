'''TPU-native Mask+Keypoint R-CNN (R50-FPN) in flax/XLA with static shapes.

Replaces the Detectron2 model stack selected by m2de/model/config.py:21-94
(COCO-Keypoints keypoint_rcnn_R_50_FPN_3x + mask head, 1 class, 8 keypoints).
Every stage — RPN proposal selection, NMS, ROIAlign, head outputs — uses
fixed top-K padding with validity masks so the whole forward compiles to one
statically-shaped XLA program.
'''
from moseq2_detectron_extract_tpu.models.config import ModelConfig, get_base_config
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN

__all__ = ['ModelConfig', 'get_base_config', 'MaskKeypointRCNN']
