"""SPIN flax model: shape checks + numerical parity vs an independent torch
ResNet-50/IEF built with the SPIN repo's layer naming, through the converter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrr_tpu.models import spin


def test_init_and_shapes():
    model, variables = spin.init_spin(jax.random.PRNGKey(0))
    img = jnp.zeros((2, 3, 224, 224))
    pose, betas, cam = spin.spin_apply(model, variables, img)
    assert pose.shape == (2, 24, 6)
    assert betas.shape == (2, 10)
    assert cam.shape == (2, 3)


def _build_torch_spin(torch):
    """Minimal torch ResNet-50 + IEF with SPIN state_dict naming."""
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class TorchSPIN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, 3, 1)
            self.layer2 = self._make_layer(128, 4, 2)
            self.layer3 = self._make_layer(256, 6, 2)
            self.layer4 = self._make_layer(512, 3, 2)
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc1 = tnn.Linear(2048 + 24 * 6 + 13, 1024)
            self.fc2 = tnn.Linear(1024, 1024)
            self.decpose = tnn.Linear(1024, 144)
            self.decshape = tnn.Linear(1024, 10)
            self.deccam = tnn.Linear(1024, 3)

        def _make_layer(self, planes, blocks, stride):
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
            return tnn.Sequential(*layers)

        def forward(self, x, init_pose, init_shape, init_cam, n_iter=3):
            import torch as t

            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            xf = self.avgpool(x).flatten(1)
            pose, shape, cam = init_pose, init_shape, init_cam
            for _ in range(n_iter):
                xc = t.cat([xf, pose, shape, cam], dim=1)
                xc = t.relu(self.fc1(xc))
                xc = t.relu(self.fc2(xc))
                pose = self.decpose(xc) + pose
                shape = self.decshape(xc) + shape
                cam = self.deccam(xc) + cam
            return pose, shape, cam

    return TorchSPIN()


@pytest.mark.slow
def test_parity_with_torch_reference():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    tmodel = _build_torch_spin(torch)
    tmodel.eval()
    # Randomize BN stats so running-average parity is actually exercised.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    mean_params = {
        "pose": np.random.default_rng(0).normal(size=(1, 144)).astype(np.float32) * 0.1,
        "shape": np.zeros((1, 10), np.float32),
        "cam": np.asarray([[0.9, 0.0, 0.0]], np.float32),
    }
    variables = spin.convert_torch_spin_checkpoint(sd, mean_params)

    img = np.random.default_rng(1).normal(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        tp, ts, tc = tmodel(
            torch.from_numpy(img),
            torch.from_numpy(np.repeat(mean_params["pose"], 2, 0)),
            torch.from_numpy(np.repeat(mean_params["shape"], 2, 0)),
            torch.from_numpy(np.repeat(mean_params["cam"], 2, 0)),
        )

    model = spin.SPIN()
    pose, betas, cam = model.apply(variables, jnp.asarray(img), train=False)
    np.testing.assert_allclose(np.asarray(pose).reshape(2, 144), tp.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(betas), ts.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cam), tc.numpy(), atol=2e-3)


def test_normalize_image():
    img = jnp.ones((1, 3, 4, 4)) * 0.5
    out = np.asarray(spin.normalize_image(img))
    np.testing.assert_allclose(out[0, 0, 0, 0], (0.5 - 0.485) / 0.229, rtol=1e-5)
