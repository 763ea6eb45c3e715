"""Run the full 3-step inference pipeline on the bundled example timelapse.

Mirror of reference examples/test.py:1-44. Requires the deployment bundle
(python scripts/make_deployed_model.py once, if deployed_model/ is absent).
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.dirname(__file__) + '/..'))
import axtrack_tpu as axtrack

inference_data_dir = f'{axtrack.PKG_DIR}/examples/'
dest_dir = os.path.join(inference_data_dir, 'output')
imseq_fname = 'example_timelapse.tif'
mask_fname = 'example_timelapse_mask.npy'

# the example movie is a deterministic seeded draw (~740 MB at the
# reference's full 2920x6364 example geometry) — regenerate it on demand
# instead of committing it
from axtrack_tpu.data.synthetic import ensure_example_fixture
ensure_example_fixture(inference_data_dir)

parameters, model, stnd_scaler = axtrack.setup_inference(dest_dir)

# adjust because example data is quite short (20 frames)
parameters.update({'MCF_MAX_FLOW': 140, 'MCF_MIN_FLOW': 2})

use_cached_datasets = None
check_preproc = True
input_metadata = {'dt': 31, 'pixelsize': .62,
                  'incubation_time': 52, 'name': 'example_timelapse'}
timelapse = axtrack.prepare_input_data(
    imseq_fname, parameters, dest_dir, inference_data_dir, stnd_scaler,
    mask_fname=mask_fname, use_cached_datasets=use_cached_datasets,
    check_preproc=check_preproc, input_metadata=input_metadata)

axon_dets = axtrack.inference(timelapse, model, dest_dir, parameters,
                              detections_cache='to',
                              astar_paths_cache='to',
                              assigedIDs_cache='to')

dets = axon_dets.IDed_dets_all
print(dets)
print(f'\n{len(dets)} axon identities tracked over {len(axon_dets)} frames')
axtrack.visualize_inference(axon_dets, which_dets='IDed',
                            draw_scalebar=False, animated=True, show=False,
                            draw_brightened_bg=True)
