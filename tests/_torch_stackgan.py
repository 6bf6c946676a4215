"""Torch reference implementation of the StackGAN-v2-lineage G_NET / D_NETs
for cross-validating the checkpoint porter (s2i_tpu/port/stackgan_torch.py).

SURVEY.md §2 tags the reference GAN's topology [K]: "StackGAN-v2 joint G:
FC z+c -> 4x4 map, upsample to 64; 2 next-stage blocks (residual + condition
re-injection) to 128, 256; toRGB head per stage" and per-scale Ds with
conditional + unconditional heads. This module re-states that public
topology in torch with the standard StackGAN-v2 module/parameter naming the
porter consumes (fc.0/fc.1, upsample{N}.1/.2, jointConv.0/.1,
residual.{i}.block.{j}, img.0, img_code_s16.{j}, ...), so a state_dict saved
from it is name-for-name the shape of a reference ``netG.pth``/``netD*.pth``.

Test-only code: the production framework never imports torch for modeling.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class GLU(nn.Module):
    def forward(self, x):
        nc = x.size(1) // 2
        return x[:, :nc] * torch.sigmoid(x[:, nc:])


def conv3x3(in_planes, out_planes):
    return nn.Conv2d(in_planes, out_planes, 3, stride=1, padding=1, bias=False)


def upBlock(in_planes, out_planes):
    return nn.Sequential(
        nn.Upsample(scale_factor=2, mode="nearest"),
        conv3x3(in_planes, out_planes * 2),
        nn.BatchNorm2d(out_planes * 2),
        GLU(),
    )


def Block3x3_relu(in_planes, out_planes):
    return nn.Sequential(
        conv3x3(in_planes, out_planes * 2),
        nn.BatchNorm2d(out_planes * 2),
        GLU(),
    )


class ResBlock(nn.Module):
    def __init__(self, channel_num):
        super().__init__()
        self.block = nn.Sequential(
            conv3x3(channel_num, channel_num * 2),
            nn.BatchNorm2d(channel_num * 2),
            GLU(),
            conv3x3(channel_num, channel_num),
            nn.BatchNorm2d(channel_num),
        )

    def forward(self, x):
        return x + self.block(x)


class CA_NET(nn.Module):
    def __init__(self, t_dim, c_dim):
        super().__init__()
        self.t_dim = t_dim
        self.c_dim = c_dim
        self.fc = nn.Linear(t_dim, c_dim * 4, bias=True)
        self.relu = GLU()

    def encode(self, emb):
        x = self.relu(self.fc(emb))
        return x[:, : self.c_dim], x[:, self.c_dim :]


class INIT_STAGE_G(nn.Module):
    def __init__(self, ngf, z_dim, c_dim):
        super().__init__()
        self.gf_dim = ngf  # == 16 * GF_DIM
        self.fc = nn.Sequential(
            nn.Linear(z_dim + c_dim, ngf * 4 * 4 * 2, bias=False),
            nn.BatchNorm1d(ngf * 4 * 4 * 2),
            GLU(),
        )
        self.upsample1 = upBlock(ngf, ngf // 2)
        self.upsample2 = upBlock(ngf // 2, ngf // 4)
        self.upsample3 = upBlock(ngf // 4, ngf // 8)
        self.upsample4 = upBlock(ngf // 8, ngf // 16)

    def forward(self, z_code, c_code):
        in_code = torch.cat((c_code, z_code), 1)  # v2 order: condition first
        out = self.fc(in_code)
        out = out.view(-1, self.gf_dim, 4, 4)
        out = self.upsample1(out)
        out = self.upsample2(out)
        out = self.upsample3(out)
        return self.upsample4(out)


class NEXT_STAGE_G(nn.Module):
    def __init__(self, ngf, nef, num_residual=2):
        super().__init__()
        self.gf_dim = ngf
        self.ef_dim = nef
        self.jointConv = Block3x3_relu(ngf + nef, ngf)
        self.residual = nn.Sequential(
            *[ResBlock(ngf) for _ in range(num_residual)]
        )
        self.upsample = upBlock(ngf, ngf // 2)

    def forward(self, h_code, c_code):
        s = h_code.size(2)
        c = c_code.view(-1, self.ef_dim, 1, 1).repeat(1, 1, s, s)
        x = torch.cat((c, h_code), 1)  # v2 order: condition first
        x = self.jointConv(x)
        x = self.residual(x)
        return self.upsample(x)


class GET_IMAGE_G(nn.Module):
    def __init__(self, ngf):
        super().__init__()
        self.img = nn.Sequential(conv3x3(ngf, 3), nn.Tanh())

    def forward(self, h_code):
        return self.img(h_code)


class G_NET(nn.Module):
    """Joint multi-stage generator, `forward(z, c_code)` with c_code given
    (the CA sample is drawn outside so tests stay deterministic)."""

    def __init__(self, gf_dim, t_dim, c_dim, z_dim, branch_num=3, r_num=2):
        super().__init__()
        ngf = gf_dim
        self.branch_num = branch_num
        self.ca_net = CA_NET(t_dim, c_dim)
        if branch_num > 0:
            self.h_net1 = INIT_STAGE_G(ngf * 16, z_dim, c_dim)
            self.img_net1 = GET_IMAGE_G(ngf)
        if branch_num > 1:
            self.h_net2 = NEXT_STAGE_G(ngf, c_dim, r_num)
            self.img_net2 = GET_IMAGE_G(ngf // 2)
        if branch_num > 2:
            self.h_net3 = NEXT_STAGE_G(ngf // 2, c_dim, r_num)
            self.img_net3 = GET_IMAGE_G(ngf // 4)

    def forward(self, z_code, c_code):
        fake_imgs = []
        h = self.h_net1(z_code, c_code)
        fake_imgs.append(self.img_net1(h))
        if self.branch_num > 1:
            h = self.h_net2(h, c_code)
            fake_imgs.append(self.img_net2(h))
        if self.branch_num > 2:
            h = self.h_net3(h, c_code)
            fake_imgs.append(self.img_net3(h))
        return fake_imgs


def encode_image_by_16times(ndf):
    return nn.Sequential(
        nn.Conv2d(3, ndf, 4, 2, 1, bias=False),
        nn.LeakyReLU(0.2, inplace=True),
        nn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ndf * 2),
        nn.LeakyReLU(0.2, inplace=True),
        nn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ndf * 4),
        nn.LeakyReLU(0.2, inplace=True),
        nn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ndf * 8),
        nn.LeakyReLU(0.2, inplace=True),
    )


def downBlock(in_planes, out_planes):
    return nn.Sequential(
        nn.Conv2d(in_planes, out_planes, 4, 2, 1, bias=False),
        nn.BatchNorm2d(out_planes),
        nn.LeakyReLU(0.2, inplace=True),
    )


def Block3x3_leakRelu(in_planes, out_planes):
    return nn.Sequential(
        conv3x3(in_planes, out_planes),
        nn.BatchNorm2d(out_planes),
        nn.LeakyReLU(0.2, inplace=True),
    )


class D_GET_LOGITS(nn.Module):
    """Pre-sigmoid logits (the porter target applies BCE-with-logits; the
    reference's trailing nn.Sigmoid carries no parameters, so the state_dict
    is identical either way)."""

    def __init__(self, ndf, nef, bcondition=False):
        super().__init__()
        self.ef_dim = nef
        self.bcondition = bcondition
        if bcondition:
            self.jointConv = Block3x3_leakRelu(ndf * 8 + nef, ndf * 8)
        self.outlogits = nn.Sequential(nn.Conv2d(ndf * 8, 1, 4, stride=4))

    def forward(self, h_code, c_code=None):
        if self.bcondition and c_code is not None:
            c = c_code.view(-1, self.ef_dim, 1, 1).repeat(1, 1, 4, 4)
            h_code = self.jointConv(torch.cat((h_code, c), 1))
        return self.outlogits(h_code).view(-1)


class D_NET64(nn.Module):
    def __init__(self, ndf, nef):
        super().__init__()
        self.img_code_s16 = encode_image_by_16times(ndf)
        self.logits = D_GET_LOGITS(ndf, nef, bcondition=True)
        self.uncond_logits = D_GET_LOGITS(ndf, nef, bcondition=False)

    def forward(self, x, c_code):
        code = self.img_code_s16(x)
        return self.logits(code, c_code), self.uncond_logits(code)


class D_NET128(nn.Module):
    def __init__(self, ndf, nef):
        super().__init__()
        self.img_code_s16 = encode_image_by_16times(ndf)
        self.img_code_s32 = downBlock(ndf * 8, ndf * 16)
        self.img_code_s32_1 = Block3x3_leakRelu(ndf * 16, ndf * 8)
        self.logits = D_GET_LOGITS(ndf, nef, bcondition=True)
        self.uncond_logits = D_GET_LOGITS(ndf, nef, bcondition=False)

    def forward(self, x, c_code):
        code = self.img_code_s32_1(self.img_code_s32(self.img_code_s16(x)))
        return self.logits(code, c_code), self.uncond_logits(code)


class D_NET256(nn.Module):
    def __init__(self, ndf, nef):
        super().__init__()
        self.img_code_s16 = encode_image_by_16times(ndf)
        self.img_code_s32 = downBlock(ndf * 8, ndf * 16)
        self.img_code_s64 = downBlock(ndf * 16, ndf * 32)
        self.img_code_s64_1 = Block3x3_leakRelu(ndf * 32, ndf * 16)
        self.img_code_s64_2 = Block3x3_leakRelu(ndf * 16, ndf * 8)
        self.logits = D_GET_LOGITS(ndf, nef, bcondition=True)
        self.uncond_logits = D_GET_LOGITS(ndf, nef, bcondition=False)

    def forward(self, x, c_code):
        code = self.img_code_s16(x)
        code = self.img_code_s64(self.img_code_s32(code))
        code = self.img_code_s64_2(self.img_code_s64_1(code))
        return self.logits(code, c_code), self.uncond_logits(code)
