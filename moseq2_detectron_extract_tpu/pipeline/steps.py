'''Concrete pipeline steps: frame production, TPU inference, feature
post-processing, result/preview writing.

Parity targets: m2de/pipeline/produce_frames_step.py, inference_step.py,
process_features_step.py, write_results_step.py, preview_video_writer_step.py.
'''
import logging
import os
from functools import partial
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from moseq2_detectron_extract_tpu.io.result import (create_extract_h5,
                                                    write_extracted_chunk_to_h5)
from moseq2_detectron_extract_tpu.io.session import Session, Stream
from moseq2_detectron_extract_tpu.io.video import PreviewVideoWriter
from moseq2_detectron_extract_tpu.ops.instances import (
    gather_selected_mask_windows, gather_selected_windows, nms_and_centers,
    packbits_device, unpack_masks_cropped, unpackbits_host, window_origins)
from moseq2_detectron_extract_tpu.ops.preprocess import (decode_prepped_frames,
                                                         prep_raw_frames_host,
                                                         scale_raw_frames)
from moseq2_detectron_extract_tpu.ops.warp import crop_and_rotate_frames
from moseq2_detectron_extract_tpu.pipeline.pipeline_step import PipelineStep
from moseq2_detectron_extract_tpu.proc.features import (
    dispatch_instance_features, finish_instance_features)
from moseq2_detectron_extract_tpu.proc.keypoints import (dispatch_z_lookup,
                                                         keypoints_to_dict)
from moseq2_detectron_extract_tpu.proc.kalman import (KalmanTracker, KalmanTrackerAngle,
                                                      KalmanTrackerNPoints2D,
                                                      KalmanTrackerPoint2D)
from moseq2_detectron_extract_tpu.proc.scalars import compute_scalars
from moseq2_detectron_extract_tpu.proc.tracker import CentroidTracker

import h5py


class ProduceFramesStep(PipelineStep):
    '''Stream prepped depth frames from the session in chunks
    (m2de/pipeline/produce_frames_step.py).'''

    def __init__(self, session: Session, **kwargs):
        super().__init__(**kwargs)
        self.session = session

    def initialize(self):
        config = self.config
        # blocked streaming: the prep filter below is per-frame, so reading
        # + prepping in ~14 MB blocks (vs one ~430 MB raw chunk pass) keeps
        # the producer's working set LLC-resident and stops it evicting the
        # 7 sibling stages' caches (io/session.py:SessionFramesIterator)
        self.iterator = self.session.iterate(
            chunk_size=config['chunk_size'],
            chunk_overlap=config['chunk_overlap'],
            streams=(Stream.DEPTH,),
            block_frames=config.get('read_block_frames', 32))
        # host prep (numpy): bg-subtract/ROI/clamp/cast with dropout pixels
        # sentinel-encoded; the device decodes + fills them. Halves the
        # host->device volume vs uploading raw uint16.
        self.iterator.attach_filter(Stream.DEPTH, partial(
            prep_raw_frames_host,
            bground_im=self.session.bground_im,
            roi=self.session.roi,
            vmin=config['min_height'],
            vmax=config['max_height'],
            dtype=config['frame_dtype']))
        self.reset_progress(self.session.nframes)

    def generate(self):
        chunk_size = self.config['chunk_size']
        first = True
        for frame_idxs, chunk in self.iterator:
            offset = 0 if first else self.config['chunk_overlap']
            first = False
            chunk = np.asarray(chunk)
            # pad tail chunks (repeat last frame) so every chunk shares one
            # compiled shape; writers slice back to the true length
            if chunk.shape[0] < chunk_size and self.config.get('pad_chunks', True):
                pad = chunk_size - chunk.shape[0]
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            self.update_progress(len(frame_idxs))
            yield {'frame_idxs': np.asarray(frame_idxs),
                   'chunk': chunk,
                   'offset': offset}


class InferenceStep(PipelineStep):
    '''Batched model inference on device (m2de/pipeline/inference_step.py).

    The Predictor may be injected via config['predictor'] (tests) or loaded
    from config['model'] (a model dir).
    '''

    def initialize(self):
        predictor = self.config.get('predictor')
        if predictor is None:
            from moseq2_detectron_extract_tpu.models.predictor import Predictor
            predictor = Predictor.from_model_dir(
                self.config['model'],
                checkpoint=self.config.get('checkpoint', 'last'),
                batch_size=self.config.get('batch_size', 10),
                score_threshold=self.config.get('instance_threshold', 0.5))
        self.predictor = predictor
        # 'full' uploads the whole sentinel-encoded chunk and resizes on
        # device; 'prescaled' resizes to the model canvas on host and
        # uploads that (+ per-detection windows later) — ~3x fewer H2D
        # bytes, the winning mode when the host<->device link is thin
        self.device_input = self.config.get('device_input', 'full')

    def process(self, data):
        if self.device_input == 'prescaled' and \
                data['chunk'].dtype != np.uint8:
            # the host prescale's intensity mapping targets the uint8 range;
            # fall back to the device-resize path for uint16 frame_dtype
            logging.warning("device_input='prescaled' requires uint8 frames; "
                            'falling back to full-resolution device input')
            self.device_input = 'full'
        if self.device_input == 'prescaled' and \
                hasattr(self.predictor, 'predict_prescaled'):
            from moseq2_detectron_extract_tpu.ops.preprocess import \
                prescale_frames_host
            chunk = data['chunk']
            h, w = chunk.shape[1], chunk.shape[2]
            canvas = prescale_frames_host(
                chunk, self.predictor.cfg,
                vmin=self.config['min_height'],
                vmax=self.config['max_height'],
                fill_sentinel=np.iinfo(chunk.dtype).max)
            data['inference'] = self.predictor.predict_prescaled(
                canvas, (h, w), select=True)
            # data['chunk'] keeps its sentinels: ProcessFeatures slices its
            # raw windows from it (device harmonic fill per window), then
            # zeroes the sentinels for the preview
        else:
            # single H2D upload of the sentinel-encoded uint8 chunk;
            # everything after this stays device-resident until compact
            # results come back
            chunk_dev = decode_prepped_frames(jnp.asarray(data['chunk']))
            frames = scale_raw_frames(chunk_dev, self.config['min_height'],
                                      self.config['max_height'])
            data['chunk_dev'] = chunk_dev
            # zero the dropout sentinels for host consumers in place
            # (np.where would allocate + copy the whole ~200 MB chunk again)
            chunk = data['chunk']
            if not chunk.flags.writeable:
                chunk = chunk.copy()
                data['chunk'] = chunk
            np.copyto(chunk, 0, where=(chunk == np.iinfo(chunk.dtype).max))
            data['inference'] = self.predictor(frames, return_device=True,
                                               select=True)
        self.update_progress(len(data['frame_idxs']))
        return data


class SelectInstancesStep(PipelineStep):
    '''Instance selection: pull the fused NMS outputs, run the sequential
    SORT-style tracker on host, dispatch the per-detection window gathers
    plus the clean/moments/height-stat device programs
    (m2de/pipeline/process_features_step.py:63-160; split out of the feature
    step so its device waits overlap the neighbors' work).'''

    def initialize(self):
        config = self.config
        # feature-stage window around each detection (clean/moments/scalars
        # run at this size instead of full frames); must comfortably exceed
        # the animal + tail so every mask pixel lands inside
        self.feature_window = int(config.get('feature_window', 160))
        self.instance_tracker = CentroidTracker(distance_threshold=50,
                                                hit_counter_max=3)
        from moseq2_detectron_extract_tpu.models.instance_logger import InstanceLogger
        self.instance_log = InstanceLogger(
            os.path.join(config['output_dir'], 'instance_log.tsv'))
        self.sub_times = {'sel_nms': 0.0, 'sel_loop': 0.0}

    def process(self, data):
        data = self._select_instances(data)
        # dispatch the whole clean/moments stage + the scalar height
        # reductions now: they depend only on device data, and the feature
        # (brain) step pulls their outputs one chunk later
        data['feat_dispatch'] = dispatch_instance_features(
            data['sel_masks'], data['raw_windows'],
            window_origins=data['win_origins'])
        masked = data['raw_windows'] * \
            jnp.asarray(data['feat_dispatch']['feat_masks'])
        from moseq2_detectron_extract_tpu.proc.scalars import \
            dispatch_scalar_stats
        data['height_stats'] = dispatch_scalar_stats(
            masked, self.config['min_height'], self.config['max_height'])
        self.update_progress(len(data['frame_idxs']))
        return data

    def finalize(self):
        self.instance_log.close()
        logging.info('[Instance Select] sub-stage busy: %s',
                     {k: round(v, 2) for k, v in self.sub_times.items()},
                     extra={'nostream': True})

    def _select_instances(self, data):
        '''Device NMS + centers; the sequential SORT-style tracker runs on host
        over tiny (N, D) arrays, then the chosen instances gather on device.'''
        inference = data['inference']
        masks_dev = jnp.asarray(inference['masks'])        # (N, D, H, W)
        keypoints_dev = jnp.asarray(inference['keypoints'])  # (N, D, K, 3)
        expected = self.config.get('expected_instances', 1)

        import time as _time
        _t0 = _time.perf_counter()
        if 'keep' in inference:
            # selection was fused into the inference program (Predictor
            # select=True): no second dispatch over the (N, D, H, W) masks
            keep_dev, centers_dev, iou_dev = (inference['keep'],
                                              inference['centers'],
                                              inference['mask_iou'])
        else:
            keep_dev, centers_dev, iou_dev = nms_and_centers(
                masks_dev, jnp.asarray(inference['scores']),
                jnp.asarray(inference['valid']))
        keep = np.asarray(keep_dev)            # (N, D) - tiny transfers
        centers = np.asarray(centers_dev)      # (N, D, 2)
        scores = np.asarray(inference['scores'])
        self.sub_times['sel_nms'] = self.sub_times.get('sel_nms', 0.0) + \
            _time.perf_counter() - _t0
        # kept boxes for the live preview's arena overlays (N, D, 4; tiny);
        # raw_boxes keeps every detection's box — the tracker may choose a
        # detection index whose keep flag is off (stale match), and the
        # window seed below must still have its real box
        raw_boxes = np.asarray(inference['boxes']).astype('float64')
        boxes = raw_boxes.copy()
        boxes[~keep] = np.nan
        data['kept_boxes'] = boxes
        n, d = keep.shape
        multi = keep.sum(axis=1) > 1
        iou = np.asarray(iou_dev) if multi.any() else None
        kpts_host = np.asarray(keypoints_dev) if multi.any() else None

        _t1 = _time.perf_counter()
        chosen_idx = np.zeros(n, dtype='int32')
        num_instances = np.zeros(n, dtype=int)
        n_true = len(data['frame_idxs'])
        for i in range(n):
            keep_idx = np.flatnonzero(keep[i])
            keep_idx = keep_idx[np.argsort(-scores[i][keep_idx])]
            if i < n_true:
                self.instance_log.log_frame(
                    int(data['frame_idxs'][i]), keep_idx, scores[i],
                    mask_iou=iou[i] if iou is not None else None,
                    centers=centers[i],
                    keypoints=kpts_host[i] if kpts_host is not None else None)

            tracked = self.instance_tracker.update(centers[i], keep[i])
            if len(tracked) > 1:
                tracked.sort(key=lambda o: o.age, reverse=True)
                chosen = [o.last_detection_index for o in tracked[:expected]
                          if o.last_detection_index is not None]
            else:
                chosen = list(keep_idx[:expected])

            num_instances[i] = len(chosen)
            if chosen:
                chosen_idx[i] = chosen[0]

        self.sub_times['sel_loop'] = self.sub_times.get('sel_loop', 0.0) + \
            _time.perf_counter() - _t1
        # chosen-instance BOX centers [x, y] (NaN when none): the whole
        # feature stage downstream runs on windows sliced around these.
        # Box center, not mask centroid: the window then contains every box
        # pixel whenever the box fits the window, and the mask and keypoints
        # both live inside the box — a centroid-seeded window has no such
        # guarantee (an elongated animal's centroid sits in the body mass,
        # pushing the tail outside the window)
        chosen_boxes = raw_boxes[np.arange(n), chosen_idx]  # (N, 4 [x0,y0,x1,y1])
        sel_centers = np.stack([(chosen_boxes[:, 0] + chosen_boxes[:, 2]) / 2,
                                (chosen_boxes[:, 1] + chosen_boxes[:, 3]) / 2],
                               axis=1)
        sel_centers[num_instances <= 0] = np.nan
        chunk = data['chunk']
        h, w = chunk.shape[1], chunk.shape[2]
        crop = min(self.feature_window, h, w)
        origins = window_origins(sel_centers, (h, w), crop)
        chunk_dev = data.get('chunk_dev')
        if chunk_dev is not None:
            # full-res depth lives on device: slice raw windows there
            mask_wins, sel_kpts, raw_wins = gather_selected_windows(
                masks_dev, keypoints_dev, jnp.asarray(chosen_idx),
                jnp.asarray(num_instances > 0), jnp.asarray(origins),
                chunk_dev, crop=crop)
        else:
            # prescaled mode: no full-res depth on device — slice the
            # sentinel-encoded windows from the HOST chunk, upload them
            # (~25 KB/frame) and harmonic-fill on device; then zero the
            # host chunk's sentinels for the preview
            mask_wins, sel_kpts = gather_selected_mask_windows(
                masks_dev, keypoints_dev, jnp.asarray(chosen_idx),
                jnp.asarray(num_instances > 0), jnp.asarray(origins),
                crop=crop)
            wins_host = np.empty((n, crop, crop), chunk.dtype)
            for i, (y0, x0) in enumerate(origins):
                wins_host[i] = chunk[i, y0:y0 + crop, x0:x0 + crop]
            raw_wins = decode_prepped_frames(jnp.asarray(wins_host))
            np.copyto(chunk, 0,
                      where=(chunk == np.iinfo(chunk.dtype).max))
        data['sel_masks'] = mask_wins          # device (N, c, c) uint8
        data['sel_keypoints'] = sel_kpts       # device (N, K, 3)
        data['raw_windows'] = raw_wins         # device (N, c, c) depth
        data['win_origins'] = origins          # (N, 2 [y0, x0]) int32
        data['num_instances'] = num_instances
        return data

class ProcessFeaturesStep(PipelineStep):
    '''Feature brain: pull the pre-dispatched moments, run the sequential
    host logic (Kalman smoothing, flip votes, angle interventions), then
    dispatch the crop/rotate + z-lookup + bit-pack device programs
    (m2de/pipeline/process_features_step.py:163-199). All large pulls happen
    one step downstream (FetchResultsStep), so this step's wait is only the
    tiny (N, ~5) moment vectors.'''

    def initialize(self):
        config = self.config
        self.crop = tuple(config['crop_size'])
        if config.get('use_tracking', True):
            self.point_tracker = KalmanTracker([
                KalmanTrackerPoint2D(order=3, delta_t=1.0),
                KalmanTrackerNPoints2D(config.get('num_keypoints', 8), order=3,
                                       delta_t=1.0),
            ])
            self.angle_tracker = KalmanTracker([
                KalmanTrackerAngle(order=3, delta_t=1.0, degrees=True),
            ])
        else:
            self.point_tracker = None
            self.angle_tracker = None
        self.sub_times: Dict[str, float] = {}

    def process(self, data):
        features = finish_instance_features(
            data.pop('feat_dispatch'), data['sel_keypoints'],
            data['num_instances'], self.point_tracker, self.angle_tracker,
            debug=self.config.get('debug_feature_processing', False),
            debug_dir=self.config['output_dir'], timers=self.sub_times)
        data['features'] = features
        for i, count in enumerate(data['num_instances'][:len(data['frame_idxs'])]):
            if count <= 0:
                self.write_message(
                    f"WARN: No instances found for frame {data['frame_idxs'][i]}",
                    logging.WARNING)
        # z heights come from the cleaned windows at the smoothed keypoints
        data['z_dev'] = dispatch_z_lookup(features['keypoints'],
                                          features['cleaned_frames'],
                                          frame_origins=features['mask_origins'])
        self._dispatch_crop_and_rotate(data)
        self.update_progress(len(data['frame_idxs']))
        return data

    def finalize(self):
        logging.info('[Process Features] sub-stage busy: %s',
                     {k: round(v, 2) for k, v in self.sub_times.items()},
                     extra={'nostream': True})

    def _dispatch_crop_and_rotate(self, data):
        centroids = data['features']['features']['centroid']
        angles = data['features']['features']['orientation']
        # feature masks are windows around each detection; crop them with
        # window-local centroids (out-of-window taps are zero — a mask pixel
        # there would have been outside its detection's window anyway)
        mask_wins = jnp.asarray(data['features']['masks']).astype(jnp.uint8)
        origins = np.asarray(data['win_origins'])
        local_centroids = np.asarray(centroids, dtype='float64') - origins[:, ::-1]

        raw_frames = data.get('chunk_dev')
        if raw_frames is not None:
            cropped = crop_and_rotate_frames(raw_frames, jnp.asarray(centroids),
                                             jnp.asarray(angles), self.crop)
        else:
            # prescaled mode: crop depth from the filled windows; the
            # beyond-window taps are arena floor (0 in prepped depth)
            cropped = crop_and_rotate_frames(
                data['raw_windows'], jnp.asarray(local_centroids),
                jnp.asarray(angles), self.crop)
        cropped_masks = crop_and_rotate_frames(
            mask_wins, jnp.asarray(local_centroids), jnp.asarray(angles),
            self.crop)
        # the 80x80 crops are the only large device->host transfer per chunk;
        # masks travel bit-packed (8x smaller)
        data['dev_cropped'] = jnp.clip(jnp.round(cropped), 0, 255).astype(
            jnp.dtype(self.config['frame_dtype']))
        data['dev_packed_masks'] = packbits_device(cropped_masks > 0.5)
        if self.config.get('preview_arena_masks', True):
            # the feature-mask windows double as the preview's arena overlay:
            # bit-packed windows travel (~3 KB/frame vs ~22 KB for the whole
            # packed plane) and paste back to full res on host
            data['dev_arena_packed'] = packbits_device(mask_wins > 0)
        # large device inputs are no longer needed downstream; dropping the
        # references here lets XLA reuse the HBM while the next chunk runs
        for key in ('chunk_dev', 'sel_masks', 'raw_windows', 'inference'):
            data.pop(key, None)
        data['features'].pop('cleaned_frames', None)
        data['features'].pop('masks', None)
        return data


class FetchResultsStep(PipelineStep):
    '''Pull every device result for a chunk to host (crops, bit-packed
    masks, scalar reductions, z heights) and assemble the writer-facing
    scalar/keypoint dicts. Isolated in its own step so the D2H waits for
    chunk N overlap the brain work of chunk N+1 and the writes of chunk
    N-1.'''

    def initialize(self):
        config = self.config
        self.crop = tuple(config['crop_size'])
        true_depth = config['true_depth']
        self.compute_keypoints = partial(keypoints_to_dict, true_depth=true_depth)
        self.scalars_fn = partial(compute_scalars,
                                  min_height=config['min_height'],
                                  max_height=config['max_height'],
                                  true_depth=true_depth)

    def process(self, data):
        features = data['features']
        data['scalars'] = self.scalars_fn(
            None, features['features'], height_stats=data.pop('height_stats'))
        data['keypoints'] = self.compute_keypoints(
            features['keypoints'], None,
            features['features']['centroid'],
            features['features']['orientation'],
            frame_origins=features['mask_origins'],
            z_data=data.pop('z_dev'))
        data['depth_frames'] = np.asarray(data.pop('dev_cropped'))
        data['mask_frames'] = unpackbits_host(
            data.pop('dev_packed_masks'), self.crop[1]).astype('uint8')
        arena_packed = data.pop('dev_arena_packed', None)
        if arena_packed is not None:
            # keep the preview overlay masks as (N, crop, crop) windows +
            # origins instead of scattering them into full (N, H, W) arena
            # planes: the full planes were ~160 MB of zeros per chunk that
            # the renderer then re-scanned per frame (VERDICT r4 item 2c)
            crop = int(arena_packed.shape[1])
            data['arena_mask_crops'] = unpackbits_host(
                np.asarray(arena_packed), crop)
            data['arena_mask_origins'] = np.asarray(data['win_origins'])
        self.update_progress(len(data['frame_idxs']))
        return data


class ResultWriterStep(PipelineStep):
    '''Write chunk results to the h5 + cumulative keypoints TSV
    (m2de/pipeline/write_results_step.py).'''

    def initialize(self):
        config = self.config
        out_dir = config['output_dir']
        self.h5_path = os.path.join(out_dir, f"results_{config['bg_roi_index']:02d}.h5")
        self.tsv_path = os.path.join(out_dir, f"keypoints_{config['bg_roi_index']:02d}.tsv")
        self.h5 = h5py.File(self.h5_path, 'w')
        create_extract_h5(self.h5, config, config['status_dict'],
                          param_annotations=config.get('param_annotations'))
        self.keypoint_rows: List[str] = []  # header + one formatted line/frame
        self.reset_progress(config['nframes'])

    def process(self, data):
        offset = data['offset']
        frame_idxs = np.asarray(data['frame_idxs']) - self.config.get('first_frame_idx', 0)
        n_true = len(frame_idxs)  # padded tail chunks carry extra frames
        results = {
            'frame_idxs': frame_idxs[offset:],
            'offset': offset,
            'scalars': {k: v[:n_true] for k, v in data['scalars'].items()},
            'depth_frames': data['depth_frames'][:n_true],
            'mask_frames': data['mask_frames'][:n_true],
            'features': {'flips': np.asarray(data['features']['flips'])[:n_true]},
            'keypoints': {k: v[:n_true] for k, v in data['keypoints'].items()},
        }
        write_extracted_chunk_to_h5(self.h5, results)
        self.h5.flush()

        # cumulative keypoints tsv, rewritten each chunk like the reference;
        # rows are immutable once written, so format each line exactly once
        kp = data['keypoints']
        keys = sorted(kp.keys())
        if not self.keypoint_rows:
            self.keypoint_rows.append('\t'.join(['frame'] + keys))
        for row_i, frame in enumerate(frame_idxs[offset:], start=offset):
            self.keypoint_rows.append('\t'.join(
                [str(int(frame))] + [str(float(kp[k][row_i])) for k in keys]))
        with open(self.tsv_path, 'w', encoding='utf-8') as fh:
            fh.write('\n'.join(self.keypoint_rows) + '\n')

        self.update_progress(len(results['frame_idxs']))
        return data['frame_idxs']

    def finalize(self):
        self.h5.close()


class PreviewVideoWriterStep(PipelineStep):
    '''Render the reference's 3-view live preview: cleaned crop + rotated
    keypoints stacked left, arena with instance overlays (ROI contour, mask
    fill, boxes, keypoint skeleton) right
    (m2de/pipeline/preview_video_writer_step.py:93-114, m2de/viz.py:524-620).'''

    def initialize(self):
        from moseq2_detectron_extract_tpu.viz import (ArenaView,
                                                      CleanedFramesView,
                                                      RotatedKeypointsView,
                                                      stack_videos)
        config = self.config
        # render BGR-native: the cv2 encoder wants BGR, so composing in its
        # order skips a block-wide cvtColor pass per 128-frame block
        order = 'bgr'
        vmin, vmax = config['min_height'], config['max_height']
        self.arena_view = ArenaView(config.get('roi'), vmin=vmin, vmax=vmax,
                                    scale=config.get('preview_arena_scale', 1.0),
                                    order=order)
        self.rot_kpt_view = RotatedKeypointsView(
            scale=config.get('preview_crop_scale', 1.5), order=order)
        self.clean_view = CleanedFramesView(
            vmin=vmin, vmax=vmax, scale=config.get('preview_crop_scale', 1.5),
            order=order)
        self.stack_videos = stack_videos
        from moseq2_detectron_extract_tpu.proc.keypoints import \
            default_keypoint_names
        self.kp_names = default_keypoint_names
        self.sub_times = {'marshal': 0.0, 'render': 0.0}
        # persistent render buffers, keyed by (name, shape): fresh-page
        # allocation per 128-frame block (~200 MB of cold pages) dominated
        # the render on the 1-core host (benchmarks/preview_attrib.py).
        # Composite buffers ride the queue to the encode step, so they
        # rotate through a ring sized from the actual links: per consumer
        # queue, maxsize blocks queued + 1 being consumed, + 1 being
        # rendered here (derived, not assumed — a larger queue_size or an
        # extra consumer grows the ring instead of corrupting frames)
        self._bufs: dict = {}
        self._ring = 1 + sum(
            (q.maxsize if q.maxsize > 0 else 8) + 1
            for q in self.output_queues)
        self._block_no = 0

    def _buf(self, name, shape, slot: int = 0):
        key = (name, shape[1:], slot)
        buf = self._bufs.get(key)
        if buf is None or buf.shape[0] < shape[0]:
            buf = np.zeros(shape, np.uint8)
            self._bufs[key] = buf
        return buf[:shape[0]]

    def _rotated_keypoints(self, kp_dict, n):
        cols = []
        for name in self.kp_names:
            x = kp_dict.get(f'rotated/{name}_x_px')
            y = kp_dict.get(f'rotated/{name}_y_px')
            if x is None or y is None:
                return None
            cols.append(np.stack([x[:n], y[:n]], axis=1))
        return np.stack(cols, axis=1)  # (N, K, 2)

    def process(self, data):
        import time as _time
        t0 = _time.perf_counter()
        offset = data['offset']
        n_true = len(data['frame_idxs'])
        chunk = np.asarray(data['chunk'])[offset:n_true]
        cropped = np.asarray(data['depth_frames'])[offset:n_true]
        masks = np.asarray(data['mask_frames'])[offset:n_true]
        frame_idxs = np.asarray(data['frame_idxs'])[offset:]

        arena_crops = data.get('arena_mask_crops')
        arena_origins = data.get('arena_mask_origins')
        if arena_crops is not None:
            arena_crops = arena_crops[offset:n_true]
            arena_origins = arena_origins[offset:n_true]
        ref_kpts = np.asarray(data['features']['keypoints'])[offset:n_true]
        boxes = data.get('kept_boxes')
        if boxes is not None:
            boxes = boxes[offset:n_true]
        rot_kpts = self._rotated_keypoints(data['keypoints'], n_true)
        if rot_kpts is not None:
            rot_kpts = rot_kpts[offset:]
        t1 = _time.perf_counter()

        # render + encode in blocks: a whole-chunk composite is ~0.7 GB and
        # measurably slows the single-core encoder (cache/bandwidth churn
        # next to the pipeline's other GB-scale arrays); blocks keep the
        # working set ~70 MB
        block = 128
        for s in range(0, len(frame_idxs), block):
            e = s + block
            tb = _time.perf_counter()
            m = len(chunk[s:e])
            cs = self.clean_view.scale
            ch, cw = int(masks.shape[1] * cs), int(masks.shape[2] * cs)
            ah = int(chunk.shape[1] * self.arena_view.scale)
            aw = int(chunk.shape[2] * self.arena_view.scale)
            arena = self.arena_view.render(
                chunk[s:e],
                mask_crops=None if arena_crops is None else arena_crops[s:e],
                mask_origins=None if arena_origins is None
                else arena_origins[s:e],
                keypoints=ref_kpts[s:e],
                boxes=None if boxes is None else boxes[s:e],
                out=self._buf('arena', (m, ah, aw, 3)))
            clean = self.clean_view.render(cropped[s:e], masks[s:e],
                                           out=self._buf('clean', (m, ch, cw, 3)))
            if rot_kpts is not None:
                rs = self.rot_kpt_view.scale
                rh, rw = int(masks.shape[1] * rs), int(masks.shape[2] * rs)
                rot = self.rot_kpt_view.render(masks[s:e], rot_kpts[s:e],
                                               out=self._buf('rot', (m, rh, rw, 3)))
                left = self.stack_videos(
                    [clean, rot], orientation='vertical',
                    out=self._buf('left', (m, clean.shape[1] + rot.shape[1],
                                           max(clean.shape[2], rot.shape[2]), 3)))
            else:
                left = clean
            slot = self._block_no % self._ring
            self._block_no += 1
            composite = self.stack_videos(
                [left, arena], orientation='horizontal',
                out=self._buf('comp', (m, max(left.shape[1], arena.shape[1]),
                                       left.shape[2] + arena.shape[2], 3),
                              slot=slot))
            tr = _time.perf_counter()
            # hand the block straight to the encode step (forward per block,
            # not per chunk, so the encoder starts while later blocks render)
            self._forward({'frame_idxs': frame_idxs[s:e],
                           'composite': composite})
            self.sub_times['render'] += tr - tb
        self.sub_times['marshal'] += t1 - t0
        return None

    def finalize(self):
        logging.info('[Preview Video] sub-stage busy: %s',
                     {k: round(v, 2) for k, v in self.sub_times.items()},
                     extra={'nostream': True})


class PreviewEncodeStep(PipelineStep):
    '''Encode rendered composite blocks to the preview mp4 — its own stage so
    the encoder overlaps the render of later blocks (the reference runs
    ffmpeg as a separate process beside a 4-thread render pool,
    m2de/pipeline/preview_video_writer_step.py:56,93-114).'''

    def initialize(self):
        config = self.config
        out_path = os.path.join(config['output_dir'],
                                f"results_{config['bg_roi_index']:02d}.mp4")
        self.writer = PreviewVideoWriter(out_path, fps=config.get('fps', 30),
                                         vmin=config['min_height'],
                                         vmax=config['max_height'],
                                         channel_order='bgr')

    def process(self, data):
        # the composite is the render step's ring buffer: in-place stamping
        # is safe (the slot is not reused until this block is consumed)
        self.writer.write_frames(data['frame_idxs'], data['composite'],
                                 writable=True)
        return None

    def finalize(self):
        self.writer.close()
