"""GAN scaffolding: VGG-style 128x128 discriminator and a VGG-19 feature
extractor skeleton (reference discriminator_vgg_arch.py:6-88,
networks.py:90-113). These back the GAN/perceptual variants of the model
factory; the shipped SelfC configs don't train them, so the feature
extractor takes imported weights rather than downloading torchvision's."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DiscriminatorVGG128(nn.Module):
    """5-stage strided conv discriminator on (N, 128, 128, C) images."""

    in_nc: int = 3
    nf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        def lrelu(z):
            return nn.leaky_relu(z, 0.2)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, name=name, momentum=0.9
            )

        nf = self.nf
        f = lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv0_0")(x))
        f = lrelu(bn("bn0_1")(nn.Conv(nf, (4, 4), (2, 2), padding=1,
                                      use_bias=False, name="conv0_1")(f)))
        f = lrelu(bn("bn1_0")(nn.Conv(nf * 2, (3, 3), padding="SAME",
                                      use_bias=False, name="conv1_0")(f)))
        f = lrelu(bn("bn1_1")(nn.Conv(nf * 2, (4, 4), (2, 2), padding=1,
                                      use_bias=False, name="conv1_1")(f)))
        f = lrelu(bn("bn2_0")(nn.Conv(nf * 4, (3, 3), padding="SAME",
                                      use_bias=False, name="conv2_0")(f)))
        f = lrelu(bn("bn2_1")(nn.Conv(nf * 4, (4, 4), (2, 2), padding=1,
                                      use_bias=False, name="conv2_1")(f)))
        f = lrelu(bn("bn3_0")(nn.Conv(nf * 8, (3, 3), padding="SAME",
                                      use_bias=False, name="conv3_0")(f)))
        f = lrelu(bn("bn3_1")(nn.Conv(nf * 8, (4, 4), (2, 2), padding=1,
                                      use_bias=False, name="conv3_1")(f)))
        f = lrelu(bn("bn4_0")(nn.Conv(nf * 8, (3, 3), padding="SAME",
                                      use_bias=False, name="conv4_0")(f)))
        f = lrelu(bn("bn4_1")(nn.Conv(nf * 8, (4, 4), (2, 2), padding=1,
                                      use_bias=False, name="conv4_1")(f)))
        f = f.reshape(f.shape[0], -1)
        f = lrelu(nn.Dense(100, name="linear1")(f))
        return nn.Dense(1, name="linear2")(f)


_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class VGGFeatureExtractor(nn.Module):
    """VGG-19 features up to layer `feature_layer` (default 34 = conv5_4
    pre-ReLU), with ImageNet input normalization. Weights are expected to
    be imported (e.g. from a torchvision state_dict via
    utils/torch_import.convert_tensor)."""

    feature_layer: int = 34
    use_input_norm: bool = True

    @nn.compact
    def __call__(self, x):  # (N,H,W,3) in [0,1]
        if self.use_input_norm:
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            x = (x - mean) / std
        layer_idx = 0
        conv_idx = 0
        for v in _VGG19_CFG:
            if layer_idx > self.feature_layer:
                break
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                layer_idx += 1
                continue
            x = nn.Conv(v, (3, 3), padding="SAME", name=f"conv_{conv_idx}")(x)
            conv_idx += 1
            layer_idx += 1
            if layer_idx <= self.feature_layer:
                x = nn.relu(x)
                layer_idx += 1
        return x


def define_D(opt):
    net_opt = opt["network_D"]
    which = net_opt["which_model_D"]
    if which == "discriminator_vgg_128":
        return DiscriminatorVGG128(in_nc=net_opt["in_nc"], nf=net_opt["nf"])
    raise NotImplementedError(f"Discriminator model [{which}] not recognized")


def define_F(opt, use_bn: bool = False):
    return VGGFeatureExtractor(feature_layer=49 if use_bn else 34)
