"""Runtime configuration flags (the analogue of the reference's Cargo
feature set `std`/`parallel`/`r1cs`, Cargo.toml:63-67, plus TPU-specific
knobs)."""

import dataclasses
import os


@dataclasses.dataclass
class Config:
    # use the fused Pallas kernels on TPU backends (jnp fallback elsewhere)
    use_pallas: bool = os.environ.get("BLS_TPU_USE_PALLAS", "auto") != "0"
    # pallas modmul tile width (lane axis)
    pallas_tile: int = int(os.environ.get("BLS_TPU_PALLAS_TILE", "256"))
    # verify-time subgroup checks (the reference always checks natively,
    # src/bls.rs:438-447; exposed as a flag for callers that pre-validate)
    check_subgroups: bool = True
    # default message length for jit signatures
    msg_len: int = 32


config = Config()
