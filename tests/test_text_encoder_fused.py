"""TextEncoder fused-attention path vs the autodiff XLA path.

Runs the EXACT production Pallas code in interpret mode on CPU
(MMRP_FORCE_PALLAS=1, same pattern as the Swin kernel tests) and checks the
two BertLayer attention implementations agree output-for-output.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.models.text_encoder import TextConfig, TextEncoder


def _run(monkeypatch, force_pallas: bool):
    if force_pallas:
        monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    else:
        monkeypatch.delenv("MMRP_FORCE_PALLAS", raising=False)
    cfg = TextConfig.small(num_layers=2, dropout=0.0)
    model = TextEncoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 16)).astype(np.int32))
    mask = jnp.asarray(
        (np.arange(16)[None, :] < np.array([16, 9, 12, 4])[:, None]).astype(np.int32)
    )
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    return np.asarray(out["tokens"]), np.asarray(out["cls"])


def test_fused_equals_xla(monkeypatch):
    tok_x, cls_x = _run(monkeypatch, force_pallas=False)
    tok_f, cls_f = _run(monkeypatch, force_pallas=True)
    np.testing.assert_allclose(tok_f, tok_x, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(cls_f, cls_x, rtol=2e-4, atol=2e-4)
