"""Dilated ResNet backbone parity vs a hand-built torch reference with the
torchvision state-dict layout (torchvision itself is not installed)."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from protosam_tpu.models.backbones.resnet import DeeplabRes101Encoder
from protosam_tpu.utils.torch_convert import convert_deeplab_resnet101


class Bottleneck(nn.Module):
    """torchvision Bottleneck semantics (expansion 4, dilated conv2)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class TinyDilatedResNet(nn.Module):
    """layers=(1,1,1,1) variant of the torchvision dilated scheme with
    matching state-dict key names (backbone.* + localconv)."""

    def __init__(self):
        super().__init__()
        bb = nn.Module()
        bb.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        bb.bn1 = nn.BatchNorm2d(64)
        bb.layer1 = nn.Sequential(Bottleneck(64, 64, 1, 1, True))
        bb.layer2 = nn.Sequential(Bottleneck(256, 128, 2, 1, True))
        bb.layer3 = nn.Sequential(Bottleneck(512, 256, 1, 1, True))
        bb.layer4 = nn.Sequential(Bottleneck(1024, 512, 1, 2, True))
        self.backbone = bb
        self.localconv = nn.Conv2d(2048, 256, 1, bias=False)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

    def forward(self, x):
        b = self.backbone
        x = self.maxpool(self.relu(b.bn1(b.conv1(x))))
        x = b.layer4(b.layer3(b.layer2(b.layer1(x))))
        return self.localconv(x)


def test_resnet_parity(rng):
    torch.manual_seed(0)
    t = TinyDilatedResNet().eval()
    # non-trivial BN stats + weights
    sd = t.state_dict()
    g = torch.Generator().manual_seed(3)
    for k in sd:
        if "running_var" in k:
            sd[k] = torch.rand(sd[k].shape, generator=g) + 0.5
        elif "num_batches" in k:
            continue
        else:
            sd[k] = torch.randn(sd[k].shape, generator=g) * 0.1
    t.load_state_dict(sd)

    f = DeeplabRes101Encoder(layers=(1, 1, 1, 1))
    params = convert_deeplab_resnet101(t.state_dict())

    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x)).numpy()
    got = np.asarray(f.apply({"params": params},
                             jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=1e-4, rtol=1e-3)
