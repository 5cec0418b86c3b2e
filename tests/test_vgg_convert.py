"""VGG19 torch state_dict import: converted weights must reproduce the
torch model's features exactly (SURVEY.md §7 hard-part 5)."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from lctvqa.models import vgg


class _TorchVgg19(nn.Module):
    """torchvision-vgg19-shaped module (state_dict key compatible) built
    here because torchvision is not installed in this environment."""

    def __init__(self):
        super().__init__()
        layers, c_in = [], 3
        for v in vgg.VGG19_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(c_in, v, 3, padding=1),
                           nn.ReLU(inplace=True)]
                c_in = v
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(7)
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(inplace=True),
            nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(inplace=True), nn.Dropout(),
            nn.Linear(4096, 1000))

    def features_4096(self, x):
        x = self.avgpool(self.features(x))
        x = torch.flatten(x, 1)
        # classifier without the final Linear (reference models.py:25-26)
        for m in list(self.classifier.children())[:-1]:
            x = m(x)
        return x


def test_converted_vgg_matches_torch_features():
    torch.manual_seed(0)
    tm = _TorchVgg19().eval()
    params = vgg.convert_torch_state_dict(tm.state_dict())
    assert len(params["features"]) == 16
    assert vgg.feature_dim(params) == 4096

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = tm.features_4096(x).numpy()
    got = np.asarray(vgg.vgg19_features(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        deterministic=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_load_pretrained_roundtrip(tmp_path):
    torch.manual_seed(1)
    tm = _TorchVgg19()
    path = str(tmp_path / "vgg19.pt")
    torch.save(tm.state_dict(), path)
    params = vgg.load_pretrained(path)
    w0 = np.asarray(params["features"][0]["w"])
    np.testing.assert_allclose(
        w0, tm.state_dict()["features.0.weight"].numpy().transpose(
            2, 3, 1, 0))
