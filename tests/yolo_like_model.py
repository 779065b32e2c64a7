"""Tiny YOLOv8-style anchor-free detector in torch (ONNX-exportable).

Output follows the YOLOv8 convention: [B, 4+nc, N] where rows 0-3 are
xywh box coords in input pixels and rows 4.. are per-class scores
(sigmoid already applied). Used by examples/detect.py and the detection
e2e test (reference counterpart: rten-examples/src/yolo.rs).
"""

from typing import List

import torch
import torch.nn as nn


class ConvBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.nn.functional.silu(self.bn(self.conv(x)))


class YoloLike(nn.Module):
    def __init__(self, nc: int = 4, ch: int = 16, img: int = 64):
        super().__init__()
        self.nc = nc
        self.img = img
        self.stem = ConvBlock(3, ch, stride=2)       # /2
        self.c1 = ConvBlock(ch, ch * 2, stride=2)    # /4
        self.c2 = ConvBlock(ch * 2, ch * 2)
        self.c3 = ConvBlock(ch * 2, ch * 4, stride=2)  # /8
        self.head_box = nn.Conv2d(ch * 4, 4, 1)
        self.head_cls = nn.Conv2d(ch * 4, nc, 1)
        self.stride = 8

    def forward(self, x):
        B = x.shape[0]
        f = self.c3(self.c2(self.c1(self.stem(x))))
        g = f.shape[2]  # grid size
        box = self.head_box(f)          # [B, 4, g, g] (ltrb distances)
        cls = self.head_cls(f).sigmoid()  # [B, nc, g, g]
        ys = torch.arange(g, dtype=x.dtype)
        cy, cx = torch.meshgrid(ys, ys, indexing="ij")
        cx = (cx + 0.5) * self.stride
        cy = (cy + 0.5) * self.stride
        d = torch.nn.functional.softplus(box) * self.stride  # l, t, r, b >= 0
        x1 = cx - d[:, 0]
        y1 = cy - d[:, 1]
        x2 = cx + d[:, 2]
        y2 = cy + d[:, 3]
        xywh = torch.stack(
            [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], dim=1
        )  # [B, 4, g, g]
        out = torch.cat([xywh, cls], dim=1).reshape(B, 4 + self.nc, g * g)
        return out


def export_yolo_like(path: str, nc: int = 4, img: int = 64) -> YoloLike:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from onnx_export_util import export_onnx

    torch.manual_seed(0)
    m = YoloLike(nc=nc, img=img).eval()
    x = torch.randn(1, 3, img, img)
    export_onnx(m, x, path, ["images"], ["output0"])
    return m
