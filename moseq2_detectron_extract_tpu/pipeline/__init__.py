'''Thread-based stage-graph pipeline runtime feeding the TPU.

Design parity with m2de/pipeline/ (queue-linked steps, progress pump,
WorkerError aggregation, graceful shutdown) but threads instead of processes:
JAX releases the GIL inside XLA executions and numpy does for large ops, so
stage overlap comes free without pickling frames across process boundaries.
'''
from moseq2_detectron_extract_tpu.pipeline.pipeline import (Pipeline, WorkerError,
                                                            WorkerErrorInfo)
from moseq2_detectron_extract_tpu.pipeline.pipeline_step import PipelineStep
from moseq2_detectron_extract_tpu.pipeline.steps import (FetchResultsStep,
                                                         InferenceStep,
                                                         PreviewEncodeStep,
                                                         PreviewVideoWriterStep,
                                                         ProcessFeaturesStep,
                                                         ProduceFramesStep,
                                                         ResultWriterStep,
                                                         SelectInstancesStep)

__all__ = ['Pipeline', 'WorkerError', 'WorkerErrorInfo', 'PipelineStep',
           'ProduceFramesStep', 'InferenceStep', 'SelectInstancesStep',
           'ProcessFeaturesStep', 'FetchResultsStep',
           'PreviewVideoWriterStep', 'PreviewEncodeStep', 'ResultWriterStep']
