"""Witness-input parsing and per-step IVC input preparation.

Mirrors the reference's universal JSON input structure
(vimz/src/input.rs:8-105) and the per-transformation step-input layout of
the sonobe backend (vimz/src/sonobe_backend/input.rs:15-83):

- brightness/contrast/grayscale: [original_row (W), transformed_row (W)]
- blur/sharpness: [orig_row_i..i+2 (3W), transformed_row (W)] over the
  zero-padded original
- hash/crop: [original_row (W)]
- redact: [block (160), indicator (1)]
- resize: [3 original rows (3*W), 2 transformed rows (2*W/2)]

Step inputs are Python-int matrices here; the circuit layer converts them to
limb arrays in bulk.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum

import numpy as np


class Transformation(str, Enum):
    BLUR = "blur"
    BRIGHTNESS = "brightness"
    CONTRAST = "contrast"
    CROP = "crop"
    GRAYSCALE = "grayscale"
    HASH = "hash"
    REDACT = "redact"
    RESIZE = "resize"
    SHARPNESS = "sharpness"

    @property
    def ivc_state_len(self) -> int:
        # reference: vimz/src/transformation.rs:42-49
        return {
            Transformation.BLUR: 4,
            Transformation.SHARPNESS: 4,
            Transformation.BRIGHTNESS: 3,
            Transformation.CONTRAST: 3,
            Transformation.CROP: 3,
            Transformation.GRAYSCALE: 2,
            Transformation.REDACT: 2,
            Transformation.RESIZE: 2,
            Transformation.HASH: 1,
        }[self]

    def step_input_width(self, width_words: int = 128) -> int:
        # reference: vimz/src/transformation.rs:52-65 (HD values; scaled by row width)
        w = width_words
        return {
            Transformation.BLUR: 4 * w,
            Transformation.SHARPNESS: 4 * w,
            Transformation.BRIGHTNESS: 2 * w,
            Transformation.CONTRAST: 2 * w,
            Transformation.GRAYSCALE: 2 * w,
            Transformation.CROP: w,
            Transformation.HASH: w,
            Transformation.REDACT: 161,
            Transformation.RESIZE: 3 * w + 2 * (w // 2),
        }[self]

    @property
    def hash_mode(self) -> str:
        return "block-wise" if self == Transformation.REDACT else "row-wise"

    def ivc_initial_state(self, extra) -> list[int]:
        # reference: vimz/src/transformation.rs:25-39
        if self in (Transformation.BLUR, Transformation.SHARPNESS):
            return [0, 0, 0, 0]
        if self in (Transformation.BRIGHTNESS, Transformation.CONTRAST):
            return [0, 0, int(extra)]
        if self == Transformation.CROP:
            return [0, 0, int(extra)]
        if self in (Transformation.GRAYSCALE, Transformation.REDACT, Transformation.RESIZE):
            return [0, 0]
        return [0]


class Resolution(str, Enum):
    SD = "SD"
    HD = "HD"
    FHD = "FHD"
    R4K = "4K"
    R8K = "8K"

    @property
    def iteration_count(self) -> int:
        return {"SD": 480, "HD": 720, "FHD": 1080, "4K": 2160, "8K": 4320}[self.value]

    @property
    def width(self) -> int:
        return {"SD": 640, "HD": 1280, "FHD": 1920, "4K": 3840, "8K": 7680}[self.value]

    @property
    def width_words(self) -> int:
        return self.width // 10

    @property
    def iteration_count_block_based(self) -> int:
        # reference only defines HD (vimz/src/transformation.rs:104-112); we
        # generalize: (H/40) * (W/40) blocks.
        return (self.iteration_count // 40) * (self.width // 40)

    @property
    def ratio_to_lower(self) -> tuple[int, int]:
        return {"HD": (3, 2), "FHD": (3, 2), "4K": (2, 1), "8K": (2, 1)}[self.value]


@dataclass
class VIMzInput:
    original: np.ndarray  # (rows, W) object ints
    transformed: np.ndarray | None
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_file(cls, path) -> "VIMzInput":
        with open(path) as f:
            data = json.load(f)
        return cls.from_dict(data)

    @classmethod
    def from_dict(cls, data: dict) -> "VIMzInput":
        def hex2int(rows):
            return np.array(
                [[int(x, 16) for x in row] for row in rows], dtype=object
            )

        original = hex2int(data["original"])
        transformed = hex2int(data["transformed"]) if data.get("transformed") else None
        extra = {}
        for key in ("factor", "info"):
            if key in data:
                extra[key] = int(data[key])
        if "redact" in data:
            extra["redact"] = [int(x, 16) for x in data["redact"]]
        return cls(original, transformed, extra)

    def extra_scalar(self) -> int:
        return self.extra.get("factor", self.extra.get("info", 0))


def prepare_step_inputs(
    transformation: Transformation,
    inp: VIMzInput,
    resolution: Resolution,
    demo_steps: int | None = None,
) -> np.ndarray:
    """(steps, step_input_width) object-int matrix of per-step IVC inputs."""
    t = transformation
    orig, tran = inp.original, inp.transformed

    if t in (Transformation.BRIGHTNESS, Transformation.CONTRAST, Transformation.GRAYSCALE):
        steps = [np.concatenate([o, tr]) for o, tr in zip(orig, tran)]
    elif t in (Transformation.BLUR, Transformation.SHARPNESS):
        steps = [
            np.concatenate([orig[i], orig[i + 1], orig[i + 2], tran[i]])
            for i in range(len(tran))
        ]
    elif t in (Transformation.HASH, Transformation.CROP):
        steps = list(orig)
    elif t == Transformation.REDACT:
        redact = inp.extra["redact"]
        steps = [
            np.concatenate([block, np.array([r], dtype=object)])
            for block, r in zip(orig, redact)
        ]
    elif t == Transformation.RESIZE:
        o_range, t_range = resolution.ratio_to_lower
        steps = []
        for i in range(len(orig) // o_range):
            steps.append(
                np.concatenate(
                    [
                        np.concatenate(orig[i * o_range : (i + 1) * o_range]),
                        np.concatenate(tran[i * t_range : (i + 1) * t_range]),
                    ]
                )
            )
    else:
        raise ValueError(t)

    out = np.array(steps, dtype=object)
    if demo_steps is not None:
        out = out[:demo_steps]
    return out
