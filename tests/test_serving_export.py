"""AOT serving artifact tests (inference/serving.py, cli/export.py).

The artifact must be self-contained (weights baked) and reproduce the live
serving step exactly on reload.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.inference.serving import (build_serving_step,
                                         export_serving_artifact,
                                         load_serving_artifact)

CFG = dict(dtype=jnp.float32, setting="baseline_input_concat", chz=8,
           seg_downscale=2, edge_downscale=2,
           eye_size=(176, 192), frame_size=(176, 384))


def test_export_roundtrip(tmp_path):
    step, variables, bdcn_vars = build_serving_step(**CFG)
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 176, 384)), jnp.float32)
    ref = jax.jit(step)(variables, bdcn_vars, frames)

    out = export_serving_artifact(
        str(tmp_path / "art"), batch_frames=2, platforms=("cpu",),
        provenance={"ckpt": "/logs/run1/best"}, **CFG)
    call, manifest = load_serving_artifact(out)
    got = call(frames)

    assert manifest["input"]["shape"] == [2, 176, 384]
    assert manifest["provenance"] == {"ckpt": "/logs/run1/best"}
    assert len(got) == 3
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=1e-5, atol=1e-4)


def test_serving_step_data_parallel():
    """Serving scales out like training does: frames batch-sharded over the
    'data' mesh, weights replicated, identical results to single-device.
    (SURVEY §2.4: DP is the only collective surface this workload needs —
    for serving too, since frames are independent.)"""
    from eghmd_tpu.parallel import (make_mesh, batch_sharding,
                                    replicated_sharding)

    step, variables, bdcn_vars = build_serving_step(**CFG)
    frames = jnp.asarray(
        np.random.RandomState(2).randint(0, 255, (8, 176, 384)), jnp.float32)
    jitted = jax.jit(step)
    ref = jitted(variables, bdcn_vars, frames)

    mesh = make_mesh()
    v_rep = jax.device_put(variables, replicated_sharding(mesh))
    b_rep = jax.device_put(bdcn_vars, replicated_sharding(mesh))
    f_sh = jax.device_put(frames, batch_sharding(mesh))
    out = jitted(v_rep, b_rep, f_sh)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.slow  # two more full export lowerings on the 1-CPU box
def test_export_bakes_given_weights(tmp_path):
    """Different weights -> different artifact outputs (weights really are
    baked, not re-initialized)."""
    step, variables, bdcn_vars = build_serving_step(**CFG)
    bumped = jax.tree.map(lambda x: x + 0.05, variables)
    frames = jnp.asarray(
        np.random.RandomState(1).randint(0, 255, (2, 176, 384)), jnp.float32)

    a = export_serving_artifact(str(tmp_path / "a"), variables=variables,
                                bdcn_vars=bdcn_vars, batch_frames=2,
                                platforms=("cpu",), **CFG)
    b = export_serving_artifact(str(tmp_path / "b"), variables=bumped,
                                bdcn_vars=bdcn_vars, batch_frames=2,
                                platforms=("cpu",), **CFG)
    out_a = load_serving_artifact(a)[0](frames)
    out_b = load_serving_artifact(b)[0](frames)
    ref = jax.jit(step)(variables, bdcn_vars, frames)
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-4)
    assert not np.allclose(np.asarray(out_a[1]), np.asarray(out_b[1]))
