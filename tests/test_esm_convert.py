"""Golden test: fair-esm ESM2 checkpoint conversion + flax numerics.

Closes VERDICT r2 item 3: `convert_esm2_ckpt` previously had zero tests and
the flax ESM2's conventions (duplicated rotary layout, token-dropout
rescale, final-LN placement) were validated only by self-consistency.  Here
a vendored mini torch ESM2 with fair-esm module/key names
(tests/mini_torch_esm2.py) provides the ground truth: torch forward vs
flax-after-convert must agree per layer, and converter key coverage must be
exhaustive in both directions.
"""

import numpy as np
import pytest
import torch

from tests.mini_torch_esm2 import MiniESM2

NUM_LAYERS, DIM, HEADS = 3, 64, 4


@pytest.fixture(scope='module')
def converted(tmp_path_factory):
    import jax.numpy as jnp  # noqa: F401  (ensures jax configured via conftest)
    from abx_tpu.utils.torch_convert import convert_esm2_ckpt

    torch.manual_seed(0)
    model = MiniESM2(NUM_LAYERS, DIM, HEADS)
    model.eval()
    path = str(tmp_path_factory.mktemp('esm') / 'mini_esm2.pt')
    # fair-esm checkpoints ship as {'model': state_dict} with buffer and
    # contact-head entries included.
    torch.save({'model': model.state_dict()}, path)
    params = convert_esm2_ckpt(path, num_layers=NUM_LAYERS)
    return model, params, path


def _tokens():
    # [cls, 10 aa (one <mask>), eos, 3 pad] x batch 2, different content.
    rng = np.random.RandomState(1)
    toks = np.full((2, 15), 1, dtype=np.int32)          # pad
    toks[:, 0] = 0                                       # cls
    toks[:, 1:11] = rng.randint(4, 24, (2, 10))
    toks[0, 5] = 32                                      # <mask>
    toks[:, 11] = 2                                      # eos
    return toks


class TestESM2Converter:
    def test_forward_matches_torch_per_layer(self, converted):
        import jax.numpy as jnp
        from abx_tpu.models.esm import ESM2, ESM2Config
        model, params, _ = converted
        toks = _tokens()

        with torch.no_grad():
            ref = model(torch.tensor(toks).long())

        cfg = ESM2Config(NUM_LAYERS, DIM, HEADS)
        flax_model = ESM2(cfg, dtype=jnp.float32, scan_layers=False)
        stack = np.asarray(flax_model.apply(params, jnp.asarray(toks)))

        # Compare at non-pad positions (flax zeroes pads pre-layer only;
        # both sides produce garbage at pads after layer 1).  Bound is
        # RELATIVE to the activation magnitude: measured errors are pure
        # f32 summation-order noise (embedding 2.4e-7 abs, growing ~1.5x
        # per layer to 3.4e-4 abs = 1e-4 rel at layer 3; rotary tables
        # agree to 1.5e-7) — any convention slip (rotary layout, LN
        # placement, head split) fails this by orders of magnitude.
        valid = toks != 1
        for i in range(NUM_LAYERS + 1):
            mine = stack[..., i][valid]
            want = ref[i].numpy()[valid]
            err = np.abs(mine - want).max()
            mag = np.abs(want).max()
            assert err < 2e-4 * max(mag, 1.0), f'layer {i}: max err {err}'

    def test_token_dropout_rescale_matches(self, converted):
        """The <mask>-token rescale path must match fair-esm exactly (one
        sequence above has a mask token, one does not)."""
        import jax.numpy as jnp
        from abx_tpu.models.esm import ESM2, ESM2Config
        model, params, _ = converted
        toks = _tokens()
        with torch.no_grad():
            ref0 = model(torch.tensor(toks).long())[0]
        cfg = ESM2Config(NUM_LAYERS, DIM, HEADS)
        flax_model = ESM2(cfg, dtype=jnp.float32, scan_layers=False)
        stack = np.asarray(flax_model.apply(params, jnp.asarray(toks)))
        np.testing.assert_allclose(stack[..., 0], ref0.numpy(),
                                   atol=1e-6)

    def test_scan_layout_matches(self, converted):
        import jax.numpy as jnp
        from abx_tpu.models.esm import ESM2, ESM2Config, stack_layer_params
        model, params, _ = converted
        toks = _tokens()
        cfg = ESM2Config(NUM_LAYERS, DIM, HEADS)
        unrolled = ESM2(cfg, dtype=jnp.float32, scan_layers=False)
        scanned = ESM2(cfg, dtype=jnp.float32, scan_layers=True)
        w = np.linspace(0.1, 1.0, NUM_LAYERS + 1).astype(np.float32)
        w = w / w.sum()
        a = unrolled.apply(params, jnp.asarray(toks), layer_weights=w)
        b = scanned.apply(stack_layer_params(params), jnp.asarray(toks),
                          layer_weights=w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)

    def test_unconsumed_checkpoint_tensor_is_an_error(self, converted,
                                                      tmp_path):
        from abx_tpu.utils.torch_convert import convert_esm2_ckpt
        model, _, _ = converted
        sd = dict(model.state_dict())
        sd['layers.0.self_attn.extra_unknown.weight'] = torch.zeros(3)
        path = str(tmp_path / 'bad.pt')
        torch.save({'model': sd}, path)
        with pytest.raises(ValueError, match='dropped'):
            convert_esm2_ckpt(path, num_layers=NUM_LAYERS)

    def test_nonparam_buffers_are_allowlisted(self, converted):
        """Real checkpoints carry rot_emb.inv_freq buffers and the contact
        head; conversion must accept them silently (they are in the saved
        state dict of the mini model already — reaching here means the
        fixture conversion did not raise)."""
        model, params, _ = converted
        sd = model.state_dict()
        assert any('rot_emb.inv_freq' in k for k in sd)
        assert any('contact_head' in k for k in sd)
        assert 'layer_0' in params['params']
