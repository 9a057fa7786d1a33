"""VGGish weight porting vs a torch replica of torchvggish's VGG module."""

import numpy as np
import torch

from avsum_tpu.audio.port_vggish import vggish_from_torch
from avsum_tpu.audio.vggish import VGGish


class TorchVGGishReplica(torch.nn.Module):
    """Literal transcription of harritaylor/torchvggish's VGG topology
    (the module the reference loads, extractors.py:188), including its
    transpose-before-flatten."""

    def __init__(self):
        super().__init__()
        self.features = torch.nn.Sequential(
            torch.nn.Conv2d(1, 64, 3, padding=1), torch.nn.ReLU(True),
            torch.nn.MaxPool2d(2, 2),
            torch.nn.Conv2d(64, 128, 3, padding=1), torch.nn.ReLU(True),
            torch.nn.MaxPool2d(2, 2),
            torch.nn.Conv2d(128, 256, 3, padding=1), torch.nn.ReLU(True),
            torch.nn.Conv2d(256, 256, 3, padding=1), torch.nn.ReLU(True),
            torch.nn.MaxPool2d(2, 2),
            torch.nn.Conv2d(256, 512, 3, padding=1), torch.nn.ReLU(True),
            torch.nn.Conv2d(512, 512, 3, padding=1), torch.nn.ReLU(True),
            torch.nn.MaxPool2d(2, 2),
        )
        self.embeddings = torch.nn.Sequential(
            torch.nn.Linear(512 * 4 * 6, 4096), torch.nn.ReLU(True),
            torch.nn.Linear(4096, 4096), torch.nn.ReLU(True),
            torch.nn.Linear(4096, 128), torch.nn.ReLU(True),
        )

    def forward(self, x):  # x: [B, 1, 96, 64]
        x = self.features(x)
        x = torch.transpose(x, 1, 3)
        x = torch.transpose(x, 1, 2)  # -> [B, 6, 4, 512]
        x = x.contiguous().view(x.size(0), -1)
        return self.embeddings(x)


def test_vggish_port_matches_torch_replica():
    torch.manual_seed(0)
    replica = TorchVGGishReplica()
    replica.eval()
    params = vggish_from_torch(replica.state_dict())

    rng = np.random.default_rng(0)
    patches = rng.standard_normal((2, 96, 64)).astype(np.float32)
    with torch.no_grad():
        theirs = replica(torch.from_numpy(patches[:, None])).numpy()
    ours = np.asarray(VGGish().apply({"params": params}, patches))
    assert ours.shape == theirs.shape == (2, 128)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
