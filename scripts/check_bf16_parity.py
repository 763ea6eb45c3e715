"""bf16-vs-f32 detection parity on the TRAINED deployed model.

The bench's CNN could run in bfloat16 (~15% e2e win on v5e), but round-2
testing on RANDOM weights showed near-threshold confidence flips. This
script answers the question properly: with the trained deployed bundle on
the bundled example movie, do f32 and bf16 compute produce the same
detections? Prints a JSON verdict; the bench flips its default only if
mismatch <= 1% (the BASELINE.json criterion).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def detections_for(dtype_name):
    import time

    import jax
    import jax.numpy as jnp
    import axtrack_tpu as axtrack
    from axtrack_tpu.models.yolo import build_model
    from axtrack_tpu.detections import AxonDetections

    import tempfile
    from axtrack_tpu.data.synthetic import ensure_example_fixture
    inference_data_dir = f'{axtrack.PKG_DIR}/examples/'
    ensure_example_fixture(inference_data_dir)
    dest_dir = tempfile.mkdtemp(prefix=f'bf16_parity_{dtype_name}_')
    parameters, model, stnd_scaler = axtrack.setup_inference(dest_dir)
    module, variables = model
    if dtype_name == 'bf16':
        module = build_model(parameters, dtype=jnp.bfloat16)
    elif dtype_name == 'mixed':   # bf16 convs (97% of FLOPs), f32 FC head
        module = build_model(parameters, dtype=jnp.bfloat16,
                             fc_dtype=jnp.float32)

    timelapse = axtrack.prepare_input_data(
        'example_timelapse.tif', parameters, dest_dir, inference_data_dir,
        stnd_scaler, mask_fname='example_timelapse_mask.npy',
        use_cached_datasets=None, check_preproc=False,
        input_metadata={'dt': 31, 'pixelsize': .62, 'incubation_time': 52,
                        'name': f'parity_{dtype_name}'})
    ax = AxonDetections((module, variables), timelapse, parameters,
                        directory=None)
    t0 = time.perf_counter()
    ax.detect_dataset()
    dt = time.perf_counter() - t0
    pts = set()
    for t in range(len(ax)):
        df = ax.get_frame_dets('confident', t)
        for x, y in zip(np.asarray(df['anchor_x']),
                        np.asarray(df['anchor_y'])):
            pts.add((t, int(x), int(y)))
    return pts, dt


def main():
    modes = os.environ.get('PARITY_MODES', 'f32,bf16,mixed').split(',')
    results = {n: detections_for(n) for n in modes}
    sets = {n: r[0] for n, r in results.items()}
    times = {n: round(r[1], 3) for n, r in results.items()}

    def near(a, B):
        return any(b[0] == a[0] and abs(a[1] - b[1]) <= 1
                   and abs(a[2] - b[2]) <= 1 for b in B)

    out = {'detect_s': times,
           'n_dets': {n: len(s) for n, s in sets.items()}}
    for name in modes:
        if name == 'f32':
            continue
        union = len(sets['f32'] | sets[name])
        inter = len(sets['f32'] & sets[name])
        only_f32 = [p for p in sets['f32'] - sets[name]
                    if not near(p, sets[name])]
        only_oth = [p for p in sets[name] - sets['f32']
                    if not near(p, sets['f32'])]
        mismatch = (len(only_f32) + len(only_oth)) / max(union, 1)
        out[name] = {
            'exact_jaccard': round(inter / max(union, 1), 4),
            'mismatch_after_1px': round(mismatch, 4),
            'parity_ok': bool(mismatch <= 0.01),
        }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
