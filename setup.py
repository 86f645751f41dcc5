from setuptools import find_packages, setup

setup(
    name='moseq2-detectron-extract-tpu',
    version='0.1.0',
    description='TPU-native MoSeq depth-video pose extraction '
                '(JAX/XLA rebuild of moseq2-detectron-extract)',
    packages=find_packages(include=['moseq2_detectron_extract_tpu*']),
    python_requires='>=3.10',
    install_requires=[
        'jax', 'flax', 'optax', 'orbax-checkpoint', 'numpy', 'h5py',
        'click', 'tqdm', 'pyyaml',
    ],
    extras_require={
        'full': ['opencv-python', 'scipy', 'scikit-learn', 'imageio'],
        'dev': ['pytest'],
    },
    entry_points={
        'console_scripts': [
            'moseq2-detectron-extract-tpu=moseq2_detectron_extract_tpu.cli:cli',
        ],
    },
)
