'''Lightweight multi-instance tracker (norfair replacement).

Parity target: the norfair Tracker configured at
m2de/pipeline/process_features_step.py:35-38 (euclidean distance threshold 50,
initialization_delay 0, hit_counter_max 3) used only to pick the
longest-tracked instances when a frame has multiple detections.
'''
import itertools
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

_ids = itertools.count()


@dataclass
class TrackedObject:
    '''One tracked instance.'''
    center: np.ndarray
    age: int = 0
    hit_counter: int = 1
    object_id: int = field(default_factory=lambda: next(_ids))
    last_detection_index: Optional[int] = None
    live: bool = True


class CentroidTracker:
    '''Greedy nearest-centroid tracker with age + hit counters.'''

    def __init__(self, distance_threshold: float = 50.0, hit_counter_max: int = 3):
        self.distance_threshold = distance_threshold
        self.hit_counter_max = hit_counter_max
        self.objects: List[TrackedObject] = []

    def update(self, centers: np.ndarray, valid: Optional[np.ndarray] = None
               ) -> List[TrackedObject]:
        '''Advance one frame with detections at ``centers`` (D, 2).

        Returns objects observed in this frame ("live"), holding the index of
        the detection they matched.
        '''
        centers = np.asarray(centers, dtype=float)
        if valid is None:
            valid = np.ones(len(centers), bool)
        det_idx = [i for i in range(len(centers)) if valid[i] and
                   np.isfinite(centers[i]).all()]

        for obj in self.objects:
            obj.age += 1
            obj.live = False
            obj.last_detection_index = None

        # greedy matching: nearest (object, detection) pairs under threshold
        pairs: List[Tuple[float, int, int]] = []
        for oi, obj in enumerate(self.objects):
            for di in det_idx:
                dist = float(np.linalg.norm(obj.center - centers[di]))
                if dist < self.distance_threshold:
                    pairs.append((dist, oi, di))
        pairs.sort()
        used_obj, used_det = set(), set()
        for dist, oi, di in pairs:
            if oi in used_obj or di in used_det:
                continue
            used_obj.add(oi)
            used_det.add(di)
            obj = self.objects[oi]
            obj.center = centers[di]
            obj.hit_counter = min(obj.hit_counter + 1, self.hit_counter_max)
            obj.live = True
            obj.last_detection_index = di

        # unmatched objects decay; unmatched detections spawn new objects
        for oi, obj in enumerate(self.objects):
            if oi not in used_obj:
                obj.hit_counter -= 1
        self.objects = [o for o in self.objects if o.hit_counter > 0]
        for di in det_idx:
            if di not in used_det:
                obj = TrackedObject(center=centers[di], live=True,
                                    last_detection_index=di)
                self.objects.append(obj)

        return [o for o in self.objects if o.live]
