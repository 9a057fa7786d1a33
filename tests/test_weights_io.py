"""Pretrained-weight plumbing: save/load + config-driven loading.

The reference gets pretrained encoders via implicit downloads
(extractors.py:25-26, 188); here ported weights are explicit artifacts
loaded by path from the config (visual.weights / audio.vggish_weights).
"""

import numpy as np
import pytest

from avsum_tpu.utils.serialization import load_params, save_params


def test_params_roundtrip(tmp_path):
    tree = {
        "a": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)},
        "b": {"scale": np.ones(5, np.float32), "bias": np.zeros(5, np.int32)},
    }
    path = str(tmp_path / "p.msgpack")
    save_params(path, tree)
    back = load_params(path)
    assert set(back) == {"a", "b"}
    np.testing.assert_array_equal(back["a"]["kernel"], tree["a"]["kernel"])
    np.testing.assert_array_equal(back["b"]["bias"], tree["b"]["bias"])
    assert back["b"]["bias"].dtype == np.int32


def test_visual_frontend_loads_config_weights(tmp_path):
    from avsum_tpu.train.config import VisualFeatConfig
    from avsum_tpu.vision.backbone import (
        TinyBackbone,
        VisualFrontend,
        fast_init,
        make_visual_frontend,
    )

    variables = fast_init(
        TinyBackbone(4096), np.zeros((1, 64, 64, 3), np.float32), seed=3
    )
    path = str(tmp_path / "tiny.msgpack")
    save_params(path, variables)

    cfg = VisualFeatConfig(backbone="tiny", weights=path, dtype="float32")
    fe_loaded = make_visual_frontend(cfg)
    fe_direct = VisualFrontend(
        cfg, model=TinyBackbone(4096), variables=variables
    )
    frames = (
        np.random.default_rng(0).random((2, 64, 64, 3)) * 255
    ).astype(np.uint8)
    np.testing.assert_allclose(
        fe_loaded.frame_features(frames),
        fe_direct.frame_features(frames),
        rtol=1e-6,
        atol=1e-6,
    )


@pytest.mark.slow
def test_audio_frontend_loads_config_weights(tmp_path):
    import jax.numpy as jnp

    from avsum_tpu.audio.frontend import AudioFrontend
    from avsum_tpu.audio.vggish import VGGISH_FRAMES, VGGish
    from avsum_tpu.train.config import AudioFeatConfig
    from avsum_tpu.vision.backbone import fast_init

    params = fast_init(
        VGGish(), jnp.zeros((1, VGGISH_FRAMES, 64)), seed=7
    )["params"]
    path = str(tmp_path / "vggish.msgpack")
    save_params(path, params)

    sr = 16000
    wav = (
        np.random.default_rng(1).standard_normal(2 * sr) * 0.1
    ).astype(np.float32)
    bounds = np.array([[0, sr], [sr, 2 * sr]], np.float32)
    out_loaded = np.asarray(
        AudioFrontend(AudioFeatConfig(vggish_weights=path)).shot_features(
            wav, bounds
        )
    )
    out_direct = np.asarray(
        AudioFrontend(AudioFeatConfig(), vggish_params=params).shot_features(
            wav, bounds
        )
    )
    np.testing.assert_array_equal(out_loaded, out_direct)


def test_dual_backbone_variables_structure():
    """The composed tree must match DualBackbone's module names so a ported
    checkpoint drops straight into the pipeline."""
    torch = pytest.importorskip("torch")
    from avsum_tpu.vision.port_torch import dual_backbone_variables

    # structure-mapping of full models is covered by
    # tests/test_vision_torchvision.py; here only the composition shape
    r_sd = {
        "conv1.weight": torch.zeros(64, 3, 7, 7),
        "bn1.weight": torch.ones(64),
        "bn1.bias": torch.zeros(64),
        "bn1.running_mean": torch.zeros(64),
        "bn1.running_var": torch.ones(64),
        "fc.weight": torch.zeros(1000, 2048),  # dropped
    }
    i_sd = {
        "Conv2d_1a_3x3.conv.weight": torch.zeros(32, 3, 3, 3),
        "Conv2d_1a_3x3.bn.weight": torch.ones(32),
        "Conv2d_1a_3x3.bn.bias": torch.zeros(32),
        "Conv2d_1a_3x3.bn.running_mean": torch.zeros(32),
        "Conv2d_1a_3x3.bn.running_var": torch.ones(32),
        "fc.weight": torch.zeros(1000, 2048),  # dropped
        "AuxLogits.fc.weight": torch.zeros(1000, 768),  # dropped
    }
    tree = dual_backbone_variables(r_sd, i_sd)
    assert set(tree) == {"params", "batch_stats"}
    assert set(tree["params"]) == {"resnet", "inception"}
    assert set(tree["batch_stats"]) == {"resnet", "inception"}
    assert tree["params"]["resnet"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
