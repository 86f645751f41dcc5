'''moseq2-detectron-extract-tpu: TPU-native rebuild of tischfieldlab/moseq2-detectron-extract.

A JAX/XLA/Pallas framework for extracting mouse pose from Kinect-v2 depth video.
The compute path (depth preprocessing, Mask+Keypoint R-CNN inference, feature
post-processing) runs on TPU via jit-compiled XLA programs with static shapes;
the host runtime (session IO, HDF5 results, thread-pipeline scheduling) is
Python threads feeding the device.

Reference behavioral parity targets are cited per-module as
``m2de/<file>:<lines>`` (the reference package ``moseq2_detectron_extract``).
'''

__version__ = '0.1.0'
