"""Fast-input serving mode (ESFNet.input_downscale).

The serving step is HBM-bandwidth-bound and its bytes are dominated by the
early full-resolution feature maps (BASELINE.md roofline), so the fastest
serving students run the WHOLE network at reduced resolution: inputs are
average-pooled at model entry and the extra factor is folded into the final
bilinear logits upsample. Like every other serving shortcut it must be
trained through (cli/distill.py --input_downscale) and pass the fidelity
gate; these tests pin the structural semantics.

Reference anchors: the operating resolution contract is 240x320/eye
(reference evaluate.py:247, utils.py:1016-1019); the regression head's
shape arithmetic is reference utils.py:1013-1037.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.config import VARIANT_PRESETS, scaled_variant
from eghmd_tpu.models import ESFNet, build_model


def _forward(model, h, w, seed=0, train=False):
    rng = jax.random.PRNGKey(seed)
    img = jax.random.uniform(rng, (2, h, w, 1), jnp.float32)
    edge = jax.random.uniform(jax.random.PRNGKey(seed + 1), (2, h, w, 1),
                              jnp.float32)
    # jit everything: eager per-primitive dispatch on this 1-core box is
    # ~5-10x slower than the cached executables (shape errors still raise
    # at trace time, so the too-small guard test keeps working)
    variables = jax.jit(
        lambda r: model.init(r, img, edge, train=False))(jax.random.PRNGKey(7))
    if train:
        out, _ = jax.jit(lambda v: model.apply(
            v, img, edge, train=True, mutable=["batch_stats"]))(variables)
        return variables, out
    return variables, jax.jit(
        lambda v: model.apply(v, img, edge, train=False))(variables)


class TestInputDownscale:
    def test_op_stays_full_resolution(self):
        variant = scaled_variant(VARIANT_PRESETS["baseline"], 6, 1.0)
        model = ESFNet(setting=variant, chz=6, growth=1.0, input_downscale=2)
        _, (op, el_out, latent) = _forward(model, 240, 320)
        assert op.shape == (2, 240, 320, 3)
        assert el_out.shape == (2, 10)
        assert np.all(np.isfinite(np.asarray(op)))
        assert np.all(np.isfinite(np.asarray(el_out)))
        # centers tanh'd, axes sigmoid'd (reference utils.py:1023-1036)
        el = np.asarray(el_out)
        assert np.all(np.abs(el[:, [0, 1, 5, 6]]) <= 1.0)
        assert np.all((el[:, [2, 3, 7, 8]] >= 0) & (el[:, [2, 3, 7, 8]] <= 1))

    def test_composes_with_seg_downscale(self):
        variant = scaled_variant(VARIANT_PRESETS["baseline"], 6, 1.0)
        model = ESFNet(setting=variant, chz=6, growth=1.0, input_downscale=2,
                       seg_downscale=2)
        _, (op, el_out, _) = _forward(model, 240, 320)
        assert op.shape == (2, 240, 320, 3)
        assert np.all(np.isfinite(np.asarray(op)))

    def test_param_tree_differs_only_in_head_width(self):
        """input_downscale halves the bottleneck, so ONLY the regression
        head's flatten-facing Dense changes shape; every conv is intact
        (the mode is a resolution change, not an architecture change)."""
        variant = scaled_variant(VARIANT_PRESETS["baseline"], 6, 1.0)
        m1 = ESFNet(setting=variant, chz=6, growth=1.0)
        m2 = ESFNet(setting=variant, chz=6, growth=1.0, input_downscale=2)
        v1, _ = _forward(m1, 240, 320)
        v2, _ = _forward(m2, 240, 320)
        f1 = jax.tree_util.tree_leaves_with_path(v1["params"])
        f2 = jax.tree_util.tree_leaves_with_path(v2["params"])
        assert len(f1) == len(f2)
        diff = [jax.tree_util.keystr(p1) for (p1, l1), (_, l2)
                in zip(f1, f2) if l1.shape != l2.shape]
        assert diff == ["['elReg']['l1']['kernel']"], diff

    def test_train_mode_and_gradients(self):
        """The mode must be trainable straight through (distillation trains
        at the serving configuration)."""
        variant = scaled_variant(VARIANT_PRESETS["baseline"], 6, 1.0)
        model = ESFNet(setting=variant, chz=6, growth=1.0, input_downscale=2)
        rng = jax.random.PRNGKey(0)
        img = jax.random.uniform(rng, (2, 240, 320, 1), jnp.float32)
        edge = jnp.zeros_like(img)
        variables = model.init(jax.random.PRNGKey(7), img, edge, train=False)

        def loss_fn(params):
            (op, el, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                img, edge, train=True, mutable=["batch_stats"])
            return jnp.mean(op.astype(jnp.float32) ** 2) + jnp.mean(
                el.astype(jnp.float32) ** 2)

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(n) for n in norms)
        # the upsample path must backpropagate into the encoder head
        head_grad = grads["enc"]["head"]["conv1"]["kernel"]
        assert float(jnp.abs(head_grad).max()) > 0

    def test_too_small_input_raises(self):
        variant = scaled_variant(VARIANT_PRESETS["baseline"], 6, 1.0)
        model = ESFNet(setting=variant, chz=6, growth=1.0, input_downscale=4)
        with pytest.raises(ValueError, match="regression head"):
            _forward(model, 240, 320)

    def test_build_model_plumbs_input_downscale(self):
        variant = scaled_variant(VARIANT_PRESETS["baseline"], 6, 1.0)
        model = build_model("ritnet_v2", variant, chz=6, growth=1.0,
                            input_downscale=2)
        assert model.input_downscale == 2


class TestRegressionHeadPoolGuard:
    def test_parity_shapes_still_pool(self):
        """The adaptive pool skip must NOT change the reference-parity
        shapes: at 240x320 (bottleneck 15x20) the head pools exactly as
        reference utils.py:1016-1019 describes, so converted checkpoints
        keep lining up. Guarded structurally: the l1 kernel's fan-in is
        3*5*32=480 (torch-CHW flatten of the 3x5x32 map)."""
        variant = VARIANT_PRESETS["baseline"]
        model = ESFNet(setting=variant)
        v, _ = _forward(model, 240, 320)
        assert v["params"]["elReg"]["l1"]["kernel"].shape[0] == 480


class TestPartialBootstrap:
    """cli/distill.py --init_ckpt: the mechanism that earned the gated
    fast-input flagship (artifacts/calib_e4s4_in2_boot) — warm-start every
    path+shape-matching leaf from a near-identical checkpoint, keep fresh
    init for the rest (reference pytorchtools.py:85-101)."""

    def test_partial_weight_loading_tree_logic(self):
        src = {"a": {"w": jnp.ones((3, 4)), "b": jnp.ones((4,))},
               "head": {"w": jnp.ones((8, 2))}}
        dst = {"a": {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))},
               "head": {"w": jnp.zeros((16, 2))},  # shape mismatch
               "extra": {"w": jnp.zeros((5,))}}    # path missing in src
        from eghmd_tpu.training.checkpoints import partial_weight_loading

        merged, copied, total = partial_weight_loading(src, dst)
        assert (copied, total) == (2, 4)
        assert float(merged["a"]["w"].sum()) == 12.0     # copied
        assert float(merged["head"]["w"].sum()) == 0.0   # kept fresh
        assert float(merged["extra"]["w"].sum()) == 0.0  # kept fresh

    def test_in2_student_bootstraps_from_fullres_ckpt(self, tmp_path):
        """Every leaf except the regression head's flatten-facing Dense
        transfers from a full-res checkpoint into the in/2 student."""
        import orbax.checkpoint as ocp

        from eghmd_tpu.training.checkpoints import partial_bootstrap_state

        variant = scaled_variant(VARIANT_PRESETS["baseline"], 6, 1.0)
        full = ESFNet(setting=variant, chz=6, growth=1.0)
        v_full, _ = _forward(full, 240, 320)
        ocp.PyTreeCheckpointer().save(
            str(tmp_path / "best"),
            {"params": v_full["params"],
             "batch_stats": v_full["batch_stats"]})

        in2 = ESFNet(setting=variant, chz=6, growth=1.0, input_downscale=2)
        v_in2, _ = _forward(in2, 240, 320, seed=5)

        class _State:
            params = v_in2["params"]
            batch_stats = v_in2["batch_stats"]

            def _replace(self, **kw):
                s = _State()
                s.params = kw.get("params", self.params)
                s.batch_stats = kw.get("batch_stats", self.batch_stats)
                return s

        state, copied, total = partial_bootstrap_state(_State(), str(tmp_path))
        assert total - copied == 1  # only elReg/l1/kernel differs in shape
        got = state.params["enc"]["head"]["conv1"]["kernel"]
        np.testing.assert_array_equal(
            np.asarray(got),
            np.asarray(v_full["params"]["enc"]["head"]["conv1"]["kernel"]))
        # the mismatched head keeps its fresh in/2-shaped init
        assert (state.params["elReg"]["l1"]["kernel"].shape
                == v_in2["params"]["elReg"]["l1"]["kernel"].shape)


class TestServingStepInputDownscale:
    def test_serving_step_shapes(self):
        from eghmd_tpu.inference.serving import build_serving_step

        step, variables, bdcn_vars = build_serving_step(
            dtype=jnp.float32, setting="baseline", chz=6, growth=1.0,
            input_downscale=2, seg_downscale=2)
        frames = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (2, 400, 640)),
            jnp.float32)
        seg, iris_px, pupil_px = jax.jit(step)(variables, bdcn_vars, frames)
        assert seg.shape == (4, 240, 320)
        assert iris_px.shape == (4, 5) and pupil_px.shape == (4, 5)
        assert np.all(np.isfinite(np.asarray(iris_px)))
        assert np.all(np.isfinite(np.asarray(pupil_px)))
