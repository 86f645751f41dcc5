'''Command-line interface: all 18 subcommands of the reference
(m2de/cli.py:72-905), driving the TPU-native stack.
'''
import logging
import os
import sys

import click
import numpy as np

from moseq2_detectron_extract_tpu.io.click import (OptionalParamType, click_param_annot,
                                                   command_with_config,
                                                   get_command_defaults)
from moseq2_detectron_extract_tpu.io.util import (ensure_dir, read_yaml, setup_logging,
                                                  scan_unextracted_sessions,
                                                  wrap_command_with_local,
                                                  wrap_command_with_slurm, write_yaml)
from moseq2_detectron_extract_tpu.proc.util import check_completion_status


@click.group()
@click.version_option()
def cli():
    '''moseq2-detectron-extract-tpu: TPU-native MoSeq depth-video extraction.'''
    if os.environ.get('MOSEQ_DETECTRON_PROFILE'):
        from moseq2_detectron_extract_tpu.utils.profiling import enable_profiling
        enable_profiling()
    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()


# ---------------------------------------------------------------------------
# extract
# ---------------------------------------------------------------------------

@cli.command(name='extract', cls=command_with_config('config_file'),
             short_help='Extract a moseq session raw data')
@click.argument('input-file', nargs=1, type=click.Path(exists=True, dir_okay=False))
@click.option('--model', type=click.Path(exists=True), help='Path to the model for inference.')
@click.option('--checkpoint', default='last', help='Model checkpoint to load. Use "last" to load the last checkpoint')
@click.option('--batch-size', default=10, type=int, help='Number of frames for each model inference iteration')
@click.option('--instance-threshold', default=0.5, type=click.FloatRange(min=0.0, max=1.0), help='Minimum score threshold to filter inference results')
@click.option('--expected-instances', default=1, type=click.IntRange(min=1), help='Maximum number of instances expected in each frame')
@click.option('--allowed-detections', default=None, type=OptionalParamType(click.IntRange(min=1)), help='Maximum number of detections reported by the detector')
@click.option('--bg-roi-dilate', default=(10, 10), type=(int, int), help='Size of the mask dilation (to include environment walls)')
@click.option('--bg-roi-shape', default='ellipse', type=str, help='Shape to use for the mask dilation (ellipse or rect)')
@click.option('--bg-roi-index', default=0, type=int, help='Index of which background mask(s) to use')
@click.option('--bg-roi-weights', default=(1, .1, 1), type=(float, float, float), help='Feature weighting (area, extent, dist) of the background mask')
@click.option('--bg-roi-depth-range', default=(650, 750), type=(float, float), help='Range to search for floor of arena (in mm)')
@click.option('--bg-roi-gradient-filter', default=False, type=bool, help='Exclude walls with gradient filtering')
@click.option('--bg-roi-gradient-threshold', default=3000, type=float, help='Gradient must be < this to include points')
@click.option('--bg-roi-gradient-kernel', default=7, type=int, help='Kernel size for Sobel gradient filtering')
@click.option('--bg-roi-fill-holes', default=True, type=bool, help='Fill holes in ROI')
@click.option('--use-plane-bground', is_flag=True, help='Use a plane fit for the background')
@click.option('--output-dir', default=None, help='Output directory to save the extraction output files')
@click.option('--frame-dtype', default='uint8', type=click.Choice(['uint8', 'uint16']), help='Data type for processed frames')
@click.option('--min-height', default=0, type=int, help='Min mouse height from floor (mm)')
@click.option('--max-height', default=100, type=int, help='Max mouse height from floor (mm)')
@click.option('--crop-size', default=(80, 80), type=(int, int), help='Size of crop region')
@click.option('--report-outliers', is_flag=True, help='Report outliers in extracted data')
@click.option('--frame-trim', default=(0, 0), type=(int, int), help='Frames to trim from beginning and end of data')
@click.option('--chunk-size', default=1000, type=int, help='Number of frames for each processing iteration')
@click.option('--chunk-overlap', default=0, type=int, help='Frames overlapped in each chunk')
@click.option('--fps', default=30, type=int, help='Frame rate of camera')
@click.option('--use-tracking/--no-use-tracking', default=True, help='during feature processing, use tracking models')
@click.option('--debug-feature-processing', is_flag=True, help='Generate additional reports of internal data during feature processing')
@click.option('--device-input', default='full', type=click.Choice(['full', 'prescaled']),
              help='Upload full-res frames and resize on device (full), or '
                   'resize to the model canvas on host and upload that plus '
                   'per-detection windows (prescaled; ~3x fewer bytes over '
                   'a thin host<->device link)')
@click.option('--config-file', type=click.Path())
def extract(model, input_file, checkpoint, batch_size, instance_threshold,
            expected_instances, allowed_detections, bg_roi_dilate, bg_roi_shape,
            bg_roi_index, bg_roi_weights, bg_roi_depth_range, bg_roi_gradient_filter,
            bg_roi_gradient_threshold, bg_roi_gradient_kernel, bg_roi_fill_holes,
            use_plane_bground, output_dir, frame_dtype, min_height, max_height,
            crop_size, report_outliers, frame_trim, chunk_size, chunk_overlap, fps,
            use_tracking, debug_feature_processing, device_input, config_file):
    '''Extract a moseq session with a trained TPU model.

    INPUT_FILE is a path to moseq raw depth data: either a compressed session
    (session.tar.gz containing depth.dat) or a depth.dat file directly.
    '''
    from moseq2_detectron_extract_tpu.extract import extract_session
    from moseq2_detectron_extract_tpu.io.session import Session
    from moseq2_detectron_extract_tpu.quality import find_outliers_h5
    from moseq2_detectron_extract_tpu.proc.keypoints import default_keypoint_names

    setup_logging(add_defered_file_handler=True)
    print('')

    if allowed_detections is None or allowed_detections < expected_instances:
        allowed_detections = (expected_instances + 1) * 2
        logging.info('WARNING: --allowed-detections was not set or less than '
                     '--expected-instances, will set --allowed-detections to %d',
                     allowed_detections)

    config_data = dict(locals())
    for key in ('extract_session', 'Session', 'find_outliers_h5',
                'default_keypoint_names'):
        config_data.pop(key, None)
    config_data.update({
        'use_tracking_model': False,
        'flip_classifier': model,
        'dataset_name': 'moseq',
        'param_annotations': click_param_annot(extract),
    })

    session = Session(input_file, frame_trim=frame_trim)
    status_filename = extract_session(session=session, config=config_data)

    if report_outliers:
        if not check_completion_status(status_filename):
            logging.info('')
            logging.info('Skipping search for outlier frames because session '
                         'extraction was not completed!')
        else:
            logging.info('')
            logging.info('Searching for outlier frames....')
            result_filename = os.path.splitext(status_filename)[0] + '.h5'
            kpt_names = [kp for kp in default_keypoint_names if kp != 'TailTip']
            find_outliers_h5(result_filename, keypoint_names=kpt_names)


# ---------------------------------------------------------------------------
# training / evaluation / deployment
# ---------------------------------------------------------------------------

@cli.command(name='train', short_help='Train a model on annotated data')
@click.argument('annot-files', nargs=-1, type=click.Path(exists=True))
@click.option('--model-dir', required=True, type=click.Path(), help='Directory to store model outputs')
@click.option('--resume', is_flag=True, help='Resume training from the latest checkpoint')
@click.option('--config', 'config_yaml', default=None, type=click.Path(exists=True), help='Model config yaml to merge over base config')
@click.option('--max-iter', default=None, type=OptionalParamType(click.INT), help='Override number of training iterations')
@click.option('--replace-paths', default=None, multiple=True, help='search:replace pairs for fixing annotation image paths')
@click.option('--init-weights', default=None, type=click.Path(exists=True),
              help='Detectron2 checkpoint (.pkl/.pth) to initialize from '
                   '(reference default: COCO keypoint_rcnn_R_50_FPN_3x zoo weights)')
def train(annot_files, model_dir, resume, config_yaml, max_iter, replace_paths,
          init_weights):
    '''Train the Mask+Keypoint R-CNN on Label Studio annotations.'''
    from moseq2_detectron_extract_tpu.models.trainer import Trainer
    from moseq2_detectron_extract_tpu.io.annot import load_annotations_helper
    from moseq2_detectron_extract_tpu.models.config import ModelConfig, get_base_config

    setup_logging()
    replace = [tuple(rp.split(':', 1)) for rp in replace_paths] if replace_paths else None
    load_annotations_helper(annot_files, 'RGB', replace_paths=replace, register=True)

    cfg = get_base_config()
    if config_yaml:
        cfg = ModelConfig.from_yaml(config_yaml)
    if max_iter:
        cfg = cfg.replace(max_iter=int(max_iter))

    ensure_dir(model_dir)
    cfg.to_yaml(os.path.join(model_dir, 'config.yaml'))
    trainer = Trainer(cfg, model_dir)
    trainer.resume_or_load(resume=resume)
    if init_weights and not resume:
        from moseq2_detectron_extract_tpu.models.convert import convert_checkpoint
        params, _ = convert_checkpoint(init_weights, trainer.state.params)
        trainer.state = trainer.state._replace(params=params)
    trainer.train()


@cli.command(name='convert-weights',
             short_help='Convert a Detectron2 checkpoint to a flax model dir')
@click.argument('src', type=click.Path(exists=True))
@click.option('--model-dir', required=True, type=click.Path(), help='Output model directory')
@click.option('--config', 'config_yaml', default=None, type=click.Path(exists=True), help='Model config yaml to use (defaults to base config)')
def convert_weights(src, model_dir, config_yaml):
    '''Convert a Detectron2 ``.pkl``/``.pth`` checkpoint (e.g. the zoo
    ``keypoint_rcnn_R_50_FPN_3x`` weights the reference trains from,
    m2de/model/config.py:30-35) into this framework's checkpoint layout.

    Shape-mismatched heads (e.g. 17 COCO keypoints vs our 8) keep their fresh
    initialization and are reported.
    '''
    import jax
    import jax.numpy as jnp
    from moseq2_detectron_extract_tpu.models.config import ModelConfig, get_base_config
    from moseq2_detectron_extract_tpu.models.convert import convert_checkpoint
    from moseq2_detectron_extract_tpu.models.checkpoint import save_checkpoint
    from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN

    setup_logging()
    cfg = ModelConfig.from_yaml(config_yaml) if config_yaml else get_base_config()
    model = MaskKeypointRCNN(cfg)
    # param shapes are spatial-size independent; a 64px image on the CPU
    # backend initializes the template in seconds instead of minutes
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with jax.default_device(jax.devices('cpu')[0]):
        template = model.init(jax.random.PRNGKey(0), images,
                              method=MaskKeypointRCNN.init_params)
    params, report = convert_checkpoint(src, template)
    ensure_dir(model_dir)
    cfg.to_yaml(os.path.join(model_dir, 'config.yaml'))
    path = save_checkpoint(model_dir, 0, {'params': params})
    click.echo(f'loaded {len(report["loaded"])} tensors, '
               f'{len(report["shape_mismatch"])} kept initialization '
               f'(shape mismatch), {len(report["unused"])} source keys unused')
    click.echo(f'wrote {path}')


@cli.command(name='evaluate', short_help='Evaluate a model checkpoint')
@click.argument('annot-files', nargs=-1, type=click.Path(exists=True))
@click.option('--model-dir', required=True, type=click.Path(exists=True))
@click.option('--checkpoint', default='last')
@click.option('--replace-paths', default=None, multiple=True)
def evaluate(annot_files, model_dir, checkpoint, replace_paths):
    '''COCO-style AP evaluation (bbox / segm / keypoints with custom OKS
    sigmas) over annotations.'''
    from moseq2_detectron_extract_tpu.io.annot import (dataset_catalog_get,
                                                       load_annotations_helper)
    from moseq2_detectron_extract_tpu.models.eval import evaluate_model

    setup_logging()
    replace = [tuple(rp.split(':', 1)) for rp in replace_paths] if replace_paths else None
    load_annotations_helper(annot_files, 'RGB', replace_paths=replace, register=True)
    results = evaluate_model(model_dir, dataset_catalog_get('moseq_test'),
                             checkpoint=checkpoint)
    for task, metrics in results.items():
        logging.info('%s: %s', task, metrics)


@cli.command(name='compile-model', short_help='AOT-compile and export a model')
@click.argument('eval-annot-files', nargs=-1, type=click.Path(exists=True))
@click.option('--model-dir', required=True, type=click.Path(exists=True))
@click.option('--checkpoint', default='last')
@click.option('--output', default=None, type=click.Path(), help='Output path for the exported model archive')
@click.option('--batch-size', default=10, type=int)
@click.option('--image-size', default=None, type=OptionalParamType(click.INT))
@click.option('--replace-paths', default=None, multiple=True)
def compile_model(eval_annot_files, model_dir, checkpoint, output, batch_size,
                  image_size, replace_paths):
    '''Serialize a deployable model: config + params + AOT-lowered StableHLO
    (the TPU analog of TorchScript export, m2de/model/deploy.py:24-123).

    Any EVAL_ANNOT_FILES given are evaluated THROUGH the exported artifact
    after export — the reference's optional post-export COCO eval
    (m2de/model/deploy.py:24-123, m2de/cli.py:664-676).
    '''
    from moseq2_detectron_extract_tpu.models.deploy import (export_model,
                                                            load_exported_model)
    setup_logging()
    out = export_model(model_dir, checkpoint=checkpoint, output=output,
                       batch_size=batch_size, image_size=image_size)
    logging.info('Exported model to %s', out)
    if eval_annot_files:
        from moseq2_detectron_extract_tpu.io.annot import (
            dataset_catalog_get, load_annotations_helper)
        from moseq2_detectron_extract_tpu.models.eval import evaluate_model
        replace = [tuple(rp.split(':', 1)) for rp in replace_paths] \
            if replace_paths else None
        load_annotations_helper(eval_annot_files, 'RGB', replace_paths=replace,
                                register=True)
        predictor = load_exported_model(out)
        results = evaluate_model(out, dataset_catalog_get('moseq_test'),
                                 predictor=predictor)
        for task, metrics in results.items():
            logging.info('post-export %s: %s', task, metrics)


@cli.command(name='infer-dataset', short_help='Pre-annotate dataset tasks with model predictions')
@click.argument('tasks-file', nargs=1, type=click.Path(exists=True))
@click.option('--model-dir', required=True, type=click.Path(exists=True))
@click.option('--checkpoint', default='last')
@click.option('--output', default=None, type=click.Path())
@click.option('--instance-threshold', default=0.5, type=float)
def infer_dataset(tasks_file, model_dir, checkpoint, output, instance_threshold):
    '''Run the model over annotation tasks and write Label Studio
    pre-annotations (polygons + keypoints), m2de/cli.py:519-632.'''
    from moseq2_detectron_extract_tpu.dataset import write_predictions_as_annotations
    setup_logging()
    out = write_predictions_as_annotations(tasks_file, model_dir,
                                           checkpoint=checkpoint, output=output,
                                           instance_threshold=instance_threshold)
    logging.info('Wrote pre-annotations to %s', out)


# ---------------------------------------------------------------------------
# session inspection / conversion
# ---------------------------------------------------------------------------

@cli.command(name='find-roi', short_help='Finds the ROI and background image')
@click.argument('input-file', type=click.Path(exists=True, dir_okay=False))
@click.option('--bg-roi-dilate', default=(10, 10), type=(int, int))
@click.option('--bg-roi-shape', default='ellipse', type=str)
@click.option('--bg-roi-index', default=0, type=int)
@click.option('--bg-roi-weights', default=(1, .1, 1), type=(float, float, float))
@click.option('--bg-roi-depth-range', default=(650, 750), type=(float, float))
@click.option('--bg-roi-gradient-filter', default=False, type=bool)
@click.option('--bg-roi-gradient-threshold', default=3000, type=float)
@click.option('--bg-roi-gradient-kernel', default=7, type=int)
@click.option('--bg-roi-fill-holes', default=True, type=bool)
@click.option('--use-plane-bground', is_flag=True)
@click.option('--output-dir', default=None)
def find_roi(input_file, bg_roi_dilate, bg_roi_shape, bg_roi_index, bg_roi_weights,
             bg_roi_depth_range, bg_roi_gradient_filter, bg_roi_gradient_threshold,
             bg_roi_gradient_kernel, bg_roi_fill_holes, use_plane_bground, output_dir):
    '''Run + cache ROI/background detection only (m2de/cli.py:279-330).'''
    from moseq2_detectron_extract_tpu.io.session import Session
    setup_logging()
    session = Session(input_file)
    if output_dir is None:
        output_dir = os.path.join(session.dirname, 'proc')
    ensure_dir(output_dir)
    session.find_roi(bg_roi_dilate=bg_roi_dilate, bg_roi_shape=bg_roi_shape,
                     bg_roi_index=bg_roi_index, bg_roi_weights=bg_roi_weights,
                     bg_roi_depth_range=bg_roi_depth_range,
                     bg_roi_gradient_filter=bg_roi_gradient_filter,
                     bg_roi_gradient_threshold=bg_roi_gradient_threshold,
                     bg_roi_gradient_kernel=bg_roi_gradient_kernel,
                     bg_roi_fill_holes=bg_roi_fill_holes,
                     use_plane_bground=use_plane_bground,
                     cache_dir=output_dir, verbose=True)
    logging.info('Detected true depth: %s', session.true_depth)


@cli.command(name='convert-raw-to-avi', short_help='Convert raw .dat to lossless ffv1 avi')
@click.argument('input-file', type=click.Path(exists=True, dir_okay=False))
@click.option('-o', '--output-file', default=None, type=click.Path())
@click.option('-b', '--chunk-size', default=3000, type=int)
@click.option('--fps', default=30, type=int)
@click.option('--delete', is_flag=True, help='Delete the input file after verification')
@click.option('-t', '--threads', default=3, type=int)
def convert_raw_to_avi(input_file, output_file, chunk_size, fps, delete, threads):
    '''Losslessly compress raw 16-bit depth (~8x smaller) with byte-exact
    verification (m2de/cli.py:181-217).'''
    from moseq2_detectron_extract_tpu.io.video import (get_raw_info, read_frames,
                                                       read_frames_raw, write_frames)
    setup_logging()
    if output_file is None:
        output_file = os.path.splitext(input_file)[0] + '.avi'

    info = get_raw_info(input_file)
    pipe = None
    for start in range(0, info['nframes'], chunk_size):
        idxs = list(range(start, min(start + chunk_size, info['nframes'])))
        frames = read_frames_raw(input_file, idxs)
        pipe = write_frames(output_file, frames, threads=threads, fps=fps,
                            close_pipe=False, pipe=pipe)
    if pipe is not None:
        pipe.stdin.close()
        pipe.wait()

    logging.info('Verifying conversion...')
    for start in range(0, info['nframes'], chunk_size):
        idxs = list(range(start, min(start + chunk_size, info['nframes'])))
        raw = read_frames_raw(input_file, idxs)
        avi = read_frames(output_file, idxs, threads=threads, fps=fps)
        if not np.array_equal(raw.astype('uint16'), avi):
            raise RuntimeError(f'Conversion mismatch in frames {idxs[0]}-{idxs[-1]}')
    logging.info('Conversion verified byte-exact')
    if delete:
        os.remove(input_file)


@cli.command(name='visualize-raw', short_help='Preview movie of a raw session')
@click.argument('input-file', type=click.Path(exists=True, dir_okay=False))
@click.option('-o', '--output-file', default=None, type=click.Path())
@click.option('--min-height', default=0, type=int)
@click.option('--max-height', default=100, type=int)
@click.option('--chunk-size', default=1000, type=int)
@click.option('--fps', default=30, type=int)
def visualize_raw(input_file, output_file, min_height, max_height, chunk_size, fps):
    '''Background-subtracted preview movie of a raw session
    (m2de/cli.py:220-276).'''
    from moseq2_detectron_extract_tpu.viz import generate_raw_preview
    setup_logging()
    out = generate_raw_preview(input_file, output_file, min_height=min_height,
                               max_height=max_height, chunk_size=chunk_size, fps=fps)
    logging.info('Wrote preview to %s', out)


@cli.command(name='visualize-result', short_help='Re-render preview mp4 from result h5')
@click.argument('result-file', type=click.Path(exists=True, dir_okay=False))
@click.option('-o', '--output-file', default=None, type=click.Path())
@click.option('--min-height', default=0, type=int)
@click.option('--max-height', default=100, type=int)
@click.option('--chunk-size', default=1000, type=int)
@click.option('--fps', default=30, type=int)
def visualize_result(result_file, output_file, min_height, max_height, chunk_size, fps):
    '''Re-render a preview video from extraction results (m2de/cli.py:715-729).'''
    from moseq2_detectron_extract_tpu.viz import H5ResultPreviewVideoGenerator
    setup_logging()
    gen = H5ResultPreviewVideoGenerator(result_file, output_file,
                                        vmin=min_height, vmax=max_height,
                                        chunk_size=chunk_size, fps=fps)
    out = gen.generate()
    logging.info('Wrote preview to %s', out)


# ---------------------------------------------------------------------------
# dataset generation
# ---------------------------------------------------------------------------

@cli.command(name='generate-dataset', short_help='Sample frames for annotation')
@click.argument('input-files', nargs=-1, type=click.Path(exists=True, dir_okay=False))
@click.option('--output-dir', required=True, type=click.Path())
@click.option('--num-samples', default=100, type=int)
@click.option('--sample-method', default='random',
              type=click.Choice(['random', 'uniform', 'kmeans', 'list']))
@click.option('--frame-indices', default=None, help='Comma-separated indices for sample-method=list')
@click.option('--min-height', default=0, type=int)
@click.option('--max-height', default=100, type=int)
@click.option('--bg-roi-depth-range', default=(650, 750), type=(float, float))
@click.option('--with-rgb', is_flag=True, help='Also export RGB frames when available')
def generate_dataset(input_files, output_dir, num_samples, sample_method,
                     frame_indices, min_height, max_height, bg_roi_depth_range,
                     with_rgb):
    '''Sample session frames to PNGs + Label Studio tasks (m2de/cli.py:422-497).'''
    from moseq2_detectron_extract_tpu.dataset import (generate_dataset_for_sessions,
                                                      write_label_studio_tasks)
    setup_logging()
    indices = None
    if frame_indices:
        indices = [int(i) for i in frame_indices.split(',')]
    tasks = generate_dataset_for_sessions(
        list(input_files), output_dir, num_samples=num_samples,
        sample_method=sample_method, frame_indices=indices,
        min_height=min_height, max_height=max_height,
        bg_roi_depth_range=bg_roi_depth_range, with_rgb=with_rgb)
    tasks_path = write_label_studio_tasks(tasks, output_dir)
    logging.info('Wrote %d tasks to %s', len(tasks), tasks_path)


@cli.command(name='dataset-info', short_help='Show dataset statistics')
@click.argument('annot-files', nargs=-1, type=click.Path(exists=True))
@click.option('--replace-paths', default=None, multiple=True)
def dataset_info(annot_files, replace_paths):
    '''Statistics report over annotation files (m2de/cli.py:500-516).'''
    from moseq2_detectron_extract_tpu.io.annot import load_annotations_helper
    setup_logging()
    replace = [tuple(rp.split(':', 1)) for rp in replace_paths] if replace_paths else None
    load_annotations_helper(annot_files, 'RGB', replace_paths=replace,
                            register=False, show_info=True)


# ---------------------------------------------------------------------------
# results maintenance
# ---------------------------------------------------------------------------

@cli.command(name='find-outliers', short_help='Outlier frame detection on a result h5')
@click.argument('result-file', type=click.Path(exists=True, dir_okay=False))
@click.option('--window', default=4, type=int)
@click.option('--threshold', default=10.0, type=float)
def find_outliers(result_file, window, threshold):
    '''Detect outlier frames in extraction results (m2de/cli.py:680-690).'''
    from moseq2_detectron_extract_tpu.quality import find_outliers_h5
    setup_logging()
    find_outliers_h5(result_file, jumping_window=window, jumping_thresh=threshold)


@cli.command(name='manual-flip', short_help='Apply human flip corrections to a result h5')
@click.argument('result-file', type=click.Path(exists=True, dir_okay=False))
@click.argument('flips-file', type=click.Path(exists=True, dir_okay=False))
@click.option('--no-backup', is_flag=True, help='Skip backing up the h5 before flipping')
def manual_flip(result_file, flips_file, no_backup):
    '''Apply flip ranges from a flips file to results (m2de/cli.py:732-769).'''
    import shutil
    from moseq2_detectron_extract_tpu.io.flips import (count_frames, flip_dataset,
                                                       read_flips_file)
    from moseq2_detectron_extract_tpu.io.util import find_unused_file_path
    setup_logging()
    nframes = count_frames(result_file)
    ranges = read_flips_file(flips_file, verify=True, verify_vmax=nframes)
    if not no_backup:
        backup = find_unused_file_path(result_file + '.bak')
        shutil.copy2(result_file, backup)
        logging.info('Backed up results to %s', backup)
    flip_dataset(result_file, flip_ranges=ranges)
    logging.info('Applied %d flip ranges', len(ranges))


@cli.command(name='verify-flips', short_help='Lint flips files')
@click.argument('flips-files', nargs=-1, type=click.Path(exists=True, dir_okay=False))
@click.option('--max-frames', default=None, type=OptionalParamType(click.INT))
def verify_flips(flips_files, max_frames):
    '''Validate flips files: parse, bounds, overlaps (m2de/cli.py:772-806).'''
    import sys as _sys
    from moseq2_detectron_extract_tpu.io.flips import read_flips_file
    setup_logging()
    failed = False
    for path in flips_files:
        try:
            ranges = read_flips_file(path, verify=True,
                                     verify_vmax=max_frames or _sys.maxsize)
            logging.info('%s: OK (%d ranges)', path, len(ranges))
        except RuntimeError as exc:
            logging.error('%s: FAILED\n%s', path, exc)
            failed = True
    if failed:
        raise SystemExit(1)


@cli.command(name='trim-result', short_help='Truncate result h5 datasets to a frame range')
@click.argument('result-file', type=click.Path(exists=True, dir_okay=False))
@click.option('--start', required=True, type=int)
@click.option('--stop', required=True, type=int)
@click.option('--no-backup', is_flag=True)
def trim_result(result_file, start, stop, no_backup):
    '''Trim all datasets to [start, stop) with backup (m2de/cli.py:866-905).'''
    import shutil
    from moseq2_detectron_extract_tpu.io.result import trim_results
    from moseq2_detectron_extract_tpu.io.util import find_unused_file_path
    setup_logging()
    if not no_backup:
        backup = find_unused_file_path(result_file + '.bak')
        shutil.copy2(result_file, backup)
        logging.info('Backed up results to %s', backup)
    trim_results(result_file, start, stop)
    logging.info('Trimmed results to frames [%d, %d)', start, stop)


# ---------------------------------------------------------------------------
# batch / config / info
# ---------------------------------------------------------------------------

@cli.command(name='generate-extract-config', short_help='Dump extract defaults to yaml')
@click.option('--output-file', '-o', default='extract-config.yaml', type=click.Path())
def generate_extract_config(output_file):
    '''Write the extract command's defaults to a yaml config
    (m2de/cli.py:809-819).'''
    defaults = get_command_defaults(extract)
    write_yaml(output_file, defaults)
    print(f'Successfully generated extract config file at "{output_file}".')


@cli.command(name='extract-batch', short_help='Generate extract commands for many sessions')
@click.argument('input-dir', type=click.Path(exists=True, file_okay=False))
@click.option('--model', required=True, type=click.Path(exists=True))
@click.option('--config-file', default=None, type=click.Path(exists=True))
@click.option('--cluster-type', default='local', type=click.Choice(['local', 'slurm']))
@click.option('--slurm-partition', default='main')
@click.option('--slurm-ncpus', default=4, type=int)
@click.option('--slurm-memory', default='16GB')
@click.option('--slurm-wall-time', default='3:00:00')
@click.option('--prefix', default=None, help='Command prefix (e.g. environment activation)')
@click.option('--extension', default='.dat')
@click.option('--bg-roi-index', default=0, type=int)
@click.option('--in-process', is_flag=True,
              help='Run the extractions NOW, sharded one-session-per-device '
                   'across the local TPU chips, instead of emitting commands')
@click.option('--max-concurrent', default=None, type=OptionalParamType(click.INT),
              help='With --in-process: bound on simultaneously running '
                   'sessions (default: one per device)')
def extract_batch(input_dir, model, config_file, cluster_type, slurm_partition,
                  slurm_ncpus, slurm_memory, slurm_wall_time, prefix, extension,
                  bg_roi_index, in_process, max_concurrent):
    '''Emit per-session extract commands for local or SLURM execution
    (m2de/cli.py:822-863) — or, with --in-process, run them immediately with
    each session's model pinned to its own local device
    (parallel/sessions.py). On a multi-host TPU pod, sessions shard across
    hosts via the emitted commands; within one host, --in-process shards
    across that host's chips.'''
    setup_logging()
    sessions = scan_unextracted_sessions(input_dir, extension=extension,
                                         bg_roi_index=bg_roi_index)
    if in_process:
        from moseq2_detectron_extract_tpu.io.util import read_yaml
        from moseq2_detectron_extract_tpu.parallel import extract_sessions_sharded
        if not sessions:
            print('No unextracted sessions found.')
            return
        config = get_command_defaults(extract)
        if config_file:
            config.update(read_yaml(config_file) or {})
        config.update({'model': model, 'bg_roi_index': bg_roi_index,
                       'output_dir': None, 'use_tracking_model': False,
                       'flip_classifier': model, 'dataset_name': 'moseq',
                       'param_annotations': click_param_annot(extract)})
        if config.get('allowed_detections') is None:
            config['allowed_detections'] = (config['expected_instances'] + 1) * 2
        results = extract_sessions_sharded(sessions, config,
                                           max_concurrent=max_concurrent)
        failed = [s for s in sessions if s not in results]
        for path, status in results.items():
            print(f'{path}: {status}')
        for path in failed:
            print(f'{path}: FAILED (see log)')
        if failed:
            sys.exit(1)
        return
    commands = []
    for session_path in sessions:
        cmd = f'moseq2-detectron-extract-tpu extract --model {model}'
        if config_file:
            cmd += f' --config-file {config_file}'
        cmd += f' {session_path}'
        commands.append(cmd)
    if cluster_type == 'slurm':
        commands = wrap_command_with_slurm(commands, prefix=prefix,
                                           partition=slurm_partition,
                                           ncpus=slurm_ncpus, memory=slurm_memory,
                                           wall_time=slurm_wall_time)
    else:
        commands = wrap_command_with_local(commands, input_dir)
    for cmd in commands:
        print(cmd)


@cli.command(name='system-info', short_help='Show framework and device info')
def system_info():
    '''Versions + TPU device table (m2de/cli.py:694-712).'''
    import jax
    from moseq2_detectron_extract_tpu import __version__
    setup_logging()
    print(f'moseq2-detectron-extract-tpu: {__version__}')
    print(f'python: {sys.version.split()[0]}')
    print(f'jax: {jax.__version__}')
    print(f'numpy: {np.__version__}')
    try:
        import flax
        print(f'flax: {flax.__version__}')
    except ImportError:
        pass
    print(f'default backend: {jax.default_backend()}')
    for i, device in enumerate(jax.devices()):
        stats = ''
        try:
            mem = device.memory_stats()
            if mem:
                used = mem.get('bytes_in_use', 0) / 2 ** 30
                limit = mem.get('bytes_limit', 0) / 2 ** 30
                stats = f' ({used:.2f}/{limit:.2f} GiB)'
        except Exception:  # noqa: BLE001
            pass
        print(f'  device {i}: {device.device_kind} [{device.platform}]{stats}')


if __name__ == '__main__':
    cli()
