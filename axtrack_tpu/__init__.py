"""axtrack_tpu — TPU-native axon-tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of LoaloaF/axtrack
(timelapse-microscopy growth-cone detection + min-cost-flow identity
tracking). Public API mirrors the reference package facade
(/root/reference/__init__.py:1-17): the three-step inference surface, config
constants, and the A* path helper.
"""
from .interface import (setup_inference, prepare_input_data, inference,
                        inference_many, visualize_inference, deploy_run)
from .config import (PKG_DIR, DEPLOYED_MODEL_DIR, OUTPUT_DIR,
                     TRAINING_DATA_DIR, DEFAULT_DEVICE, VIDEO_ENCODER)
from .utils.paths import _compute_astar_path

__all__ = ['setup_inference', 'prepare_input_data', 'inference',
           'inference_many', 'visualize_inference', 'deploy_run', 'PKG_DIR',
           'DEPLOYED_MODEL_DIR', 'OUTPUT_DIR', 'TRAINING_DATA_DIR',
           'DEFAULT_DEVICE', 'VIDEO_ENCODER', '_compute_astar_path']
