"""Frozen run configuration (SURVEY.md §5: the reference's only config is the
externally-defined CircuitConfig::pairing_config(); here every tunable is an
explicit field with the curve constants generated once in constants.py)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PairingConfig:
    #: limb geometry (must match constants.py generation)
    limb_bits: int = 8
    nlimbs: int = 48
    mont_limbs: int = 49  # R = 2^(8*49)

    #: batch of pairing instances per chip
    batch_per_chip: int = 512

    #: variable-conv strategy: "onehot_matmul" (MXU) today; "pallas" when the
    #: fused kernels land
    conv_strategy: str = "onehot_matmul"

    #: data-parallel mesh axis size (1 = single chip)
    dp: int = 1

    #: checkpoint every K Miller schedule segments (0 = off)
    checkpoint_every_segments: int = 0


DEFAULT = PairingConfig()
