"""Runtime configuration flags (the analogue of the reference's Cargo
feature set `std`/`parallel`/`r1cs`, Cargo.toml:63-67, plus TPU-specific
knobs)."""

import dataclasses
import os


@dataclasses.dataclass
class Config:
    # use the fused Pallas kernels on TPU backends (jnp fallback elsewhere)
    use_pallas: bool = os.environ.get("BLS_TPU_USE_PALLAS", "auto") != "0"
    # pallas modmul tile width (lane axis); >=1024 minimises grid-step
    # overhead for the batch sizes the bench uses
    pallas_tile: int = int(os.environ.get("BLS_TPU_PALLAS_TILE", "1024"))
    # verify-time subgroup checks (the reference always checks natively,
    # src/bls.rs:438-447; exposed as a flag for callers that pre-validate)
    check_subgroups: bool = True
    # default message length for jit signatures
    msg_len: int = 32
    # whole-Fp6 fused multiply kernel (18 Montgomery products + Toom
    # combination in ONE launch).  Default-on since the round-2 loop-form
    # kernel rewrite cut per-site Mosaic IR ~20x (the unrolled form blew
    # the remote compile helper's memory budget); measured +12% verify
    # throughput and 3x faster TPU cold compile.
    fuse_fp6: bool = os.environ.get("BLS_TPU_FUSE_FP6", "1") == "1"
    # fused Granger-Scott cyclotomic-square kernel (18 Montgomery muls +
    # all combination adds in one launch) for the final-exp x-chains
    fuse_cyclo: bool = os.environ.get("BLS_TPU_FUSE_CYCLO", "1") == "1"
    # fused exp-by-|x| kernel: the ENTIRE final-exp x-chain (squaring runs
    # + set-bit multiplies, segment lengths in SMEM) is ONE launch — the
    # six x-chains of the hard part cost six dispatches total
    fuse_expx: bool = os.environ.get("BLS_TPU_FUSE_EXPX", "1") == "1"
    # fused Fp12 kernels: full product (54 Montgomery muls), generic
    # square (36), and the sparse line multiply fp12_mul_by_014 (45) each
    # as ONE launch — the Miller loop and final exponentiation become a
    # handful of launches per step instead of dozens of stacked calls
    fuse_fp12: bool = os.environ.get("BLS_TPU_FUSE_FP12", "1") == "1"
    # fused Miller dbl/add step kernels (full CLN step + line coefficients
    # in one launch)
    fuse_steps: bool = os.environ.get("BLS_TPU_FUSE_STEPS", "1") == "1"
    # fused Miller RUN kernels: an entire doubling run (f-squarings +
    # dbl steps + line multiplies for every pair) is ONE launch with the
    # run length as an SMEM scalar, and each set-bit addition block is one
    # more — the whole Miller loop costs ~11 dispatches instead of ~270.
    # The verify pipeline is launch-latency-bound on v5e, so dispatch count
    # is the first-order cost.
    fuse_miller: bool = os.environ.get("BLS_TPU_FUSE_MILLER", "1") == "1"
    # fused Jacobian point double/add kernels (curve.pt_double/pt_add as
    # ONE launch each, G1 and G2) — the scalar-mul ladders, cofactor
    # clearing and subgroup checks become one launch per ladder step
    fuse_pt: bool = os.environ.get("BLS_TPU_FUSE_PT", "1") == "1"
    # fused 4-bit pow-window step kernels (4 squarings + table multiply in
    # one launch) for the SSWU sqrt chains and Fermat inversions
    fuse_pow: bool = os.environ.get("BLS_TPU_FUSE_POW", "1") == "1"
    # fused whole-map hash kernel (r5): both SSWU maps in fraction form +
    # isogeny + point sum as ONE launch, with the two maps sharing one
    # lane-concatenated Frobenius-split sqrt chain and one batched Fermat
    # inversion — replaces ~70 small launches and two per-map Fp2
    # inversions of the unfused hash stage
    fuse_sswu: bool = os.environ.get("BLS_TPU_FUSE_SSWU", "1") == "1"
    # fused Budroni-Pintore cofactor clearing: both |x|-ladders + psi maps
    # + all additions as ONE launch (was ~15)
    fuse_cofactor: bool = os.environ.get("BLS_TPU_FUSE_COFACTOR", "1") == "1"
    # two-accumulator merged CIOS (kernels._conv_reduce_v3): aligned lo/hi
    # accumulation removes the per-step zero-pad concats and the padded
    # 32-row window of the original loop-form CIOS.  Default ON since
    # round 4: measured 7,865 verifies/s vs 6,460 (original window CIOS)
    # at batch 4096 — the fused whole-chain kernels made the pipeline
    # compute-bound, so the ~30% leaner inner loop shows end to end.
    # (An MXU-reduction variant — lazy VPU convolution + the Montgomery
    # reduction as two exact bf16 matmuls — was raced in the same pipeline
    # and lost at 4,357 verifies/s: the 8-bit plane splits and transposes
    # around each reduction cost more VPU work than the matmuls save on
    # v5e.  Removed; BASELINE.md keeps the recorded race.)
    cios_v3: bool = os.environ.get("BLS_TPU_CIOS_V3", "1") == "1"
    # static run-structured ladders (scalar mul / Miller / exp chains):
    # "auto" enables them on TPU backends only — they cut kernel launches
    # ~2.5x at runtime but inflate XLA CPU compile times badly
    static_ladders: str = os.environ.get("BLS_TPU_STATIC_LADDERS", "auto")


config = Config()


def use_static_ladders() -> bool:
    if config.static_ladders == "auto":
        import jax

        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False
    return config.static_ladders not in ("0", "false", "off")
