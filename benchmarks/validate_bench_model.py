'''Re-validate the committed bench checkpoint's detection quality.

The AMP fix (backbone/FPN/heads now genuinely compute in bf16) changes
inference numerics vs the effective-f32 state the checkpoint was originally
evaluated under; this prints the bench-distribution detection rate and mean
top score under BOTH compute dtypes so the recorded quality claims stay
honest. Also exercises the prescaled input path.

Run on the chip: python benchmarks/validate_bench_model.py
'''
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
    from benchmarks.train_bench_model import detection_rate

    model_dir = os.environ.get(
        'BENCH_MODEL',
        os.path.join(os.path.dirname(os.path.abspath(__file__)), 'bench_model'))
    cfg, params, _ = load_model_dir(model_dir, 'last')

    out = {'model': model_dir}
    for amp in ('bfloat16', 'float32'):
        rate, score = detection_rate(cfg.replace(amp_dtype=amp), params)
        out[f'detection_rate_{amp}'] = round(rate, 4)
        out[f'mean_top_score_{amp}'] = round(score, 4)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
