'''TPU device ops: batched JAX/XLA/Pallas kernels for the extraction hot path.

These replace the cv2/scipy/bottleneck dependency kernels of the reference
(m2de/proc/proc.py, m2de/proc/roi.py) with fused, statically-shaped programs
that run per 1000-frame chunk on a single device.
'''
from moseq2_detectron_extract_tpu.ops.morphology import (dilate, erode, median_blur_3x3,
                                                         morph_open, make_ellipse_strel,
                                                         make_rect_strel)
from moseq2_detectron_extract_tpu.ops.preprocess import (fill_invalid_pixels,
                                                         find_invalid_pixels,
                                                         prep_raw_frames,
                                                         scale_raw_frames)
from moseq2_detectron_extract_tpu.ops.moments import mask_moment_features
from moseq2_detectron_extract_tpu.ops.cc import connected_components, largest_cc
from moseq2_detectron_extract_tpu.ops.warp import (crop_and_rotate_frames,
                                                   reverse_crop_and_rotate_frames)
from moseq2_detectron_extract_tpu.ops.ransac import plane_ransac
from moseq2_detectron_extract_tpu.ops.nms import batched_nms_keep_mask, nms_keep_mask
from moseq2_detectron_extract_tpu.ops.roi_align import (batched_multilevel_roi_align,
                                                        multilevel_roi_align)
from moseq2_detectron_extract_tpu.ops.instances import (gather_selected,
                                                        nms_and_centers,
                                                        packbits_device,
                                                        unpackbits_host)

__all__ = [
    'dilate', 'erode', 'median_blur_3x3', 'morph_open', 'make_ellipse_strel',
    'make_rect_strel', 'fill_invalid_pixels', 'find_invalid_pixels',
    'prep_raw_frames', 'scale_raw_frames', 'mask_moment_features',
    'connected_components', 'largest_cc', 'crop_and_rotate_frames',
    'reverse_crop_and_rotate_frames', 'plane_ransac', 'nms_keep_mask',
    'batched_nms_keep_mask', 'multilevel_roi_align',
    'batched_multilevel_roi_align', 'nms_and_centers', 'gather_selected',
    'packbits_device', 'unpackbits_host',
]
