"""Frozen run configuration (SURVEY.md §5: the reference's only config is the
externally-defined CircuitConfig::pairing_config(); here every tunable is an
explicit field, validated against the generated constants, and consumed by
bench.py, __graft_entry__.py and utils/checkpoint.py).

Resolution order: explicit constructor args > environment variables
(BENCH_BATCH / BENCH_REPS / PAIRING_STRATEGY / PAIRING_DP /
PAIRING_CKPT_EVERY) > defaults. `apply()` pushes the kernel strategy into
ops.fp and sanity-checks the limb geometry.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from . import constants as C


@dataclass(frozen=True)
class PairingConfig:
    #: limb geometry — must match the generated constants (validated in apply)
    limb_bits: int = C.LIMB_BITS    # 8
    nlimbs: int = C.NLIMBS          # 48
    mont_limbs: int = C.NRED        # 51: R = 2^408

    #: batch of pairing instances per chip (2048 amortizes the sequential
    #: final-exponentiation tail; the C++ oracle keeps the full-batch
    #: bit-exactness gate affordable at this size)
    batch_per_chip: int = 2048

    #: kernel strategy (ops.fp.set_strategy): "auto" = Pallas primitives on
    #: TPU / XLA elsewhere; "fused" additionally routes the Fq12 tower ops
    #: through the fully-fused Pallas kernels (ops/pallas/tower.py); "rns"
    #: selects the RNS arithmetic tier (ops/rns/, models/pairing_rns.py)
    strategy: str = "auto"

    #: data-parallel mesh axis size (1 = single chip)
    dp: int = 1

    #: benchmark timing repetitions
    bench_reps: int = 5

    #: checkpoint cadence in Miller schedule steps (0 = off; see
    #: utils/checkpoint.py run_pairing_checkpointed)
    checkpoint_every_steps: int = 0

    @staticmethod
    def from_env() -> "PairingConfig":
        return PairingConfig(
            batch_per_chip=int(os.environ.get("BENCH_BATCH", "2048")),
            strategy=os.environ.get("PAIRING_STRATEGY", "auto"),
            dp=int(os.environ.get("PAIRING_DP", "1")),
            bench_reps=int(os.environ.get("BENCH_REPS", "5")),
            checkpoint_every_steps=int(os.environ.get("PAIRING_CKPT_EVERY", "0")),
        )

    def apply(self) -> "PairingConfig":
        """Validate against the generated tables and install the strategy."""
        assert self.limb_bits == C.LIMB_BITS, (self.limb_bits, C.LIMB_BITS)
        assert self.nlimbs == C.NLIMBS, (self.nlimbs, C.NLIMBS)
        assert self.mont_limbs == C.NRED, (self.mont_limbs, C.NRED)
        assert self.batch_per_chip >= 1 and self.dp >= 1 and self.bench_reps >= 1
        from .ops import fp

        # "rns" is a model-level tier (models/pairing_rns.py over ops/rns/);
        # the limb-tier kernel strategy stays at its default underneath. On
        # TPU the RNS tier additionally runs its fused Pallas kernels.
        fp.set_strategy("auto" if self.strategy == "rns" else self.strategy)
        if self.strategy == "rns":
            from .ops.rns import fp as rns_fp

            # whole-scan pow kernels on; per-op tower kernels are opt-in
            # (they measured slower than XLA's own fusion — see ops/rns/fp.py)
            rns_fp.set_fused(
                True, tower=bool(int(os.environ.get("PAIRING_RNS_FUSED_TOWER", "0"))))
        return self


DEFAULT = PairingConfig()
