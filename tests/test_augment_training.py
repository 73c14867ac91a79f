import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.config import Config
from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.models.swin import SwinConfig
from mmrp_tpu.models.text_encoder import TextConfig
from mmrp_tpu.train.joint import init_train_state, make_train_step
import __graft_entry__ as G


def test_train_step_with_augmentation(rng):
    swin = SwinConfig.micro(use_pallas=False)
    text = TextConfig.small(vocab_size=64, hidden_dim=16, num_layers=1,
                            num_heads=2, intermediate_dim=32, max_positions=16)
    mm = MultiModalConfig(swin=swin, text=text, joint_dim=16,
                          num_fusion_layers=1, num_heads=2, num_classes=43,
                          max_text_len=8)
    model = MultiModalRetrievalModel(mm)
    cfg = Config(lr=1e-3, batch_size=4, augment=True)
    batch_np = G._example_batch(B=4, img=28, L=8, vocab=64, seed=5)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                             total_steps=10)
    step = make_train_step(model, cfg, donate=False)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss/total"]))
