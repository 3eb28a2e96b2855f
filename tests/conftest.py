"""Test harness setup: hermetic CPU JAX with 8 virtual devices.

The container boots every interpreter with an ``axon`` TPU plugin via a
``sitecustomize`` on PYTHONPATH, which force-registers the TPU backend
before any test code runs and ignores ``JAX_PLATFORMS=cpu``.  Tests must be
CPU-deterministic and exercise multi-device sharding, so on first entry we
re-exec pytest once with a sanitized environment: no axon site,
``JAX_PLATFORMS=cpu``, and ``--xla_force_host_platform_device_count=8``
(the JAX-idiomatic fake multi-chip mechanism — SURVEY.md §4).

The re-exec happens in ``pytest_configure`` with global capture suspended,
so the replacement process writes to the real stdout/stderr.
"""

from __future__ import annotations

import os
import sys

_REEXEC_FLAG = "MDIE_TEST_REEXECED"


def _needs_reexec() -> bool:
    return (
        os.environ.get(_REEXEC_FLAG) != "1"
        and "axon_site" in os.environ.get("PYTHONPATH", "")
    )


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env[_REEXEC_FLAG] = "1"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    xla_flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *config.invocation_params.args], env)


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------- smoke tier
# ``pytest -m smoke`` — a <3 min cross-subsystem sanity pass (VERDICT r3
# item 5): every subsystem imports and one math-oracle/behavior check each.
# Centralized here (not as decorators) so the tier reads as one list;
# entries are ``file::function`` with parametrized IDs matching by prefix.
_SMOKE = {
    # config + registry
    "test_config.py::test_comment_stripping_and_phase",
    "test_config.py::test_all_shipped_configs_parse",
    "test_config.py::test_init_obj_unknown_raises_not_implemented",
    # degradation ops (numpy/cv2 oracles, tiny shapes)
    "test_degradations.py::test_scalar_ops_match_numpy",
    "test_degradations.py::test_noise_statistics",
    "test_degradations.py::test_unknown_degradation_raises",
    "test_color_ops.py::test_hsv_roundtrip",
    "test_severity_ops.py::test_severity_parameter_mappings",
    # losses / metrics / post-processing
    "test_losses_metrics.py::test_psnr_known_value",
    "test_losses_metrics.py::test_ssim_properties",
    "test_losses_metrics.py::test_unknown_loss_raises",
    "test_postprocessing.py::test_factory_chain_and_errors",
    # data layer
    "test_data.py::test_normalize_semantics",
    "test_data.py::test_paired_dataset_pairing_modes",
    # models
    "test_cdan.py::test_param_count_matches_reference_exactly",
    "test_cdan.py::test_cbam_forward_shapes_and_gating",
    # pallas kernels (interpreter mode, small shapes)
    "test_pallas_kernels.py::test_fused_dense_block_dense_activations_hard_case",
    "test_growth_train.py::test_fused_flag_falls_back_on_unsupported_grid",
    "test_noise_kernel.py::test_kernel_math_matches_numpy_oracle",
    # engine end-to-end (TinyNet, 2 epochs, 16x24)
    "test_engine.py::test_train_writes_weights_and_logs",
    # parallel / routing
    "test_parallel.py::test_create_mesh_shapes",
    "test_pipeline.py::test_top1_routes_to_argmax_expert",
    # native IO + streaming serving
    "test_io_native.py::test_encode_png_roundtrip",
    "test_streaming.py::test_decode_chunk_shapes_and_values",
    # classifier workload + generators
    "test_classifier.py::test_f1_math_known_values",
    "test_classifier.py::test_pos_weight",
    "test_classifier_synthetic.py::test_plan_variant_is_md5_stable",
    "test_select_clean_images.py::test_selector_seed_determinism",
    # jpeg math + graft entry plumbing
    "test_graft_entry.py::test_jpeg_quality_tables",
    "test_graft_entry.py::test_dct_roundtrip_identity",
}


# Demoted to the slow tier by measured duration (2026-08-20 full-suite
# timing, /root/scratch/pytest_durations_r4.log; VERDICT r3 item 5 asked
# for a <5 min default tier).  Every demoted area keeps a fast
# representative in the default/smoke tier; `pytest -m slow` runs these.
_SLOW = {
    # full-CDAN init statistics / serving-path equivalence (module fixture
    # alone compiles CDAN twice)
    "test_torch_init.py::test_torch_reinit_statistics",
    "test_cdan_fast.py::test_fused_forward_matches_module",
    "test_cdan_fast.py::test_cm_forward_matches_module",
    "test_cdan_fast.py::test_engine_fused_flag_routes_eval",
    "test_cdan_fast.py::test_serving_apply_dispatches_by_shape",
    # engine-level BN recal (CLI trains); unit stats tests stay default
    "test_bn_recalibration.py::test_engine_bn_recalibration_rewrites_checkpoint",
    "test_bn_recalibration.py::test_engine_bn_recalibration_keeps_prerecal_backup",
    # heavy engine equality/e2e variants; the core train/test CLI pair stays
    "test_engine.py::test_scan_chunk_train_matches_host_loop",
    "test_engine.py::test_engine_with_mesh_config",
    "test_engine.py::test_unpaired_test_phase",
    "test_engine.py::test_resume_from_full_state",
    "test_engine.py::test_cli_train_lr_schedule",
    # torch-mirror backbone conversions (stable; parity-critical but slow)
    "test_backbone_parity.py::test_vgg19_features_matches_torch_mirror",
    "test_backbone_parity.py::test_alexnet_taps_match_torch_mirror",
    "test_backbone_parity.py::test_vgg16_taps_match_torch_mirror",
    "test_backbone_parity.py::test_squeeze_taps_match_torch_mirror",
    # Pallas interpreter sweeps (hard_case + fallback + tiled stay default)
    "test_pallas_kernels.py::test_fused_dense_block_matches_module",
    "test_pallas_kernels.py::test_cm_dense_block_matches_module",
    "test_pallas_kernels.py::test_cm2_fused_io_matches_module",
    "test_pallas_kernels.py::test_cm2_nhwc_io_matches_module",
    "test_pallas_kernels.py::test_cm2_bf16_activate_matches_module",
    "test_pallas_kernels.py::test_cm2_k_stacked_taps_match_module",
    "test_growth_train.py::test_fused_dense_block_gradient_class",
    "test_growth_train.py::test_growth_layer_tiled_grad_matches_autodiff",
    "test_growth_train.py::test_fused_dense_block_matches_canonical",
    # misc heavy
    "test_classifier_synthetic.py::test_loader_batches_group_by_template_and_degrade",
    "test_color_ops.py::test_hsv_and_clahe_transform_ops_run",
    "test_losses_metrics.py::test_masked_pipelines_equal_unpadded",
    "test_losses_metrics.py::test_vgg_and_lpips_terms_run",
    # second wave (default still ~8 min CPU after the first):
    # torch-CDAN transplant parity (torch CDAN fixture + full Flax forward)
    "test_reference_parity.py::test_weight_transplant_forward_parity",
    "test_reference_parity.py::test_port_rejects_shape_mismatch",
    # the driver compile-checks entry() itself every round
    "test_graft_entry.py::test_entry_traces_with_correct_shapes",
    # compiles all 9 degradations in one batch graph; per-op cv2 oracles
    # cover the math in the default tier
    "test_degradations.py::test_degrade_batch_domain",
    # spatial-sharding equality (DP equality stays default)
    "test_parallel.py::test_data_spatial_mesh_compiles_and_runs",
    "test_parallel.py::test_spatial_sharded_step_matches_single_device",
    "test_backbone_parity.py::test_lpips_alex_formula_matches_torch",
    "test_backbone_parity.py::test_lpips_vgg_and_squeeze_run",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        base = f"{os.path.basename(item.fspath)}::{item.function.__name__}"
        if base in _SMOKE:
            item.add_marker(pytest.mark.smoke)
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)
