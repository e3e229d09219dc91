"""L3: batched SHA-256 (jnp path), message-parallel.

Input layout: (..., nblocks, 16) uint32 big-endian message words (already
padded); the compression loop scans over the block axis, so the traced graph
is one compression body regardless of message length.  Static shapes only:
message byte-length must be known at trace time (per-batch equal lengths),
which matches the framework's batched-verify contract.

Parity: replaces sha2::Sha256 (native, reference src/bls.rs:9) and is the
value-level oracle target for the r1cs Sha256 gadget
(reference's use of ark-crypto-primitives Sha256Gadget, src/hasher.rs:19).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SHA256_IV, SHA256_K

_IV = jnp.asarray(np.array(SHA256_IV, np.uint32))
_K = jnp.asarray(np.array(SHA256_K, np.uint32))


def _ror(x, n):
    return (x >> n) | (x << (32 - n))


def _compress(state, block):
    """One SHA-256 compression: state (..., 8), block (..., 16) uint32.

    Both the message schedule and the 64 rounds run under lax.scan so the
    traced graph per block is ~50 equations (compile-friendly; the batch axis
    carries the parallelism)."""
    w16 = jnp.moveaxis(block, -1, 0)  # (16, ...)

    def sched_body(win, _):
        # win: (16, ...) sliding window, oldest first
        s0 = _ror(win[1], 7) ^ _ror(win[1], 18) ^ (win[1] >> 3)
        s1 = _ror(win[14], 17) ^ _ror(win[14], 19) ^ (win[14] >> 10)
        new = win[0] + s0 + win[9] + s1
        return jnp.concatenate([win[1:], new[None]], axis=0), new

    _, w_rest = jax.lax.scan(sched_body, w16, None, length=48)
    w_all = jnp.concatenate([w16, w_rest], axis=0)  # (64, ...)

    def round_body(regs, wk):
        a, b, c, d, e, f, g, h = regs
        wt, kt = wk
        S1 = _ror(e, 6) ^ _ror(e, 11) ^ _ror(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + kt + wt
        S0 = _ror(a, 2) ^ _ror(a, 13) ^ _ror(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g), None

    regs0 = tuple(state[..., i] for i in range(8))
    regs, _ = jax.lax.scan(round_body, regs0, (w_all, _K))
    out = jnp.stack(regs, axis=-1)
    return state + out


def sha256_words(blocks):
    """blocks: (..., nb, 16) uint32 -> digest (..., 8) uint32."""
    batch_shape = blocks.shape[:-2]
    nb = blocks.shape[-2]
    state = jnp.broadcast_to(_IV, batch_shape + (8,))
    if nb == 1:
        return _compress(state, blocks[..., 0, :])
    # scan over the block axis (moved to front)
    xs = jnp.moveaxis(blocks, -2, 0)

    def body(st, blk):
        return _compress(st, blk), None

    state, _ = jax.lax.scan(body, state, xs)
    return state


def bytes_to_padded_words(data_u8, msg_len: int):
    """data_u8: (..., msg_len) uint8 (or uint32 byte values) -> padded
    (..., nb, 16) uint32 words, with standard SHA-256 padding for the static
    length msg_len."""
    nb = (msg_len + 8) // 64 + 1
    total = nb * 64
    pad = np.zeros((total - msg_len,), np.uint32)
    pad[0] = 0x80
    bitlen = msg_len * 8
    for i in range(8):
        pad[-8 + i] = (bitlen >> (8 * (7 - i))) & 0xFF
    batch_shape = data_u8.shape[:-1]
    padt = jnp.broadcast_to(jnp.asarray(pad), batch_shape + pad.shape)
    full = jnp.concatenate([data_u8.astype(jnp.uint32), padt], axis=-1)
    b = full.reshape(batch_shape + (nb, 16, 4))
    words = (
        (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]
    )
    return words


def sha256_bytes(data_u8, msg_len: int):
    """(..., msg_len) byte tensor -> (..., 32) uint8-valued uint32 digest
    bytes."""
    digest = sha256_words(bytes_to_padded_words(data_u8, msg_len))
    return words_to_bytes(digest)


def sha256_bytes_var(data_u8, lens, max_len: int):
    """Variable-length batched SHA-256 with static shapes (TPU idiom: every
    element pays the max-length block count; padding and the final-state
    pick are masked/gathered).

    data_u8: (..., max_len) byte values (content beyond each element's
    length is ignored); lens: (...,) uint32 byte lengths <= max_len.
    Returns (..., 32) digest bytes."""
    nb = (max_len + 8) // 64 + 1
    total = nb * 64
    batch = data_u8.shape[:-1]
    lens = jnp.asarray(lens, jnp.uint32)
    buf = jnp.concatenate(
        [
            data_u8.astype(jnp.uint32),
            jnp.zeros(batch + (total - max_len,), jnp.uint32),
        ],
        axis=-1,
    )
    iota = jnp.broadcast_to(
        jnp.arange(total, dtype=jnp.uint32), batch + (total,)
    )
    L = lens[..., None]
    buf = jnp.where(iota < L, buf, 0)
    buf = jnp.where(iota == L, jnp.uint32(0x80), buf)
    # per-element final block index and the 8 big-endian bit-length bytes
    nb_e = (L + 8) // 64 + 1  # blocks actually used
    pos0 = nb_e * 64 - 8
    in_len = (iota >= pos0) & (iota < pos0 + 8)
    shift = jnp.where(in_len, (pos0 + 7 - iota) * 8, 0)
    # shifts >= 32 are undefined for uint32: those bytes are zero (bitlen
    # fits 32 bits for any supported message length)
    lenbyte = jnp.where(
        shift >= 32, 0, ((L * 8) >> jnp.minimum(shift, 31)) & 0xFF
    )
    buf = jnp.where(in_len, lenbyte, buf)

    b = buf.reshape(batch + (nb, 16, 4))
    words = (
        (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]
    )
    # run all nb blocks, keep per-block states, gather each element's final
    xs = jnp.moveaxis(words, -2, 0)
    state0 = jnp.broadcast_to(_IV, batch + (8,))

    def body(st, blk):
        st = _compress(st, blk)
        return st, st

    _, states = jax.lax.scan(body, state0, xs)  # (nb, ..., 8)
    states = jnp.moveaxis(states, 0, -2)  # (..., nb, 8)
    sel = ((lens + 8) // 64).astype(jnp.int32)  # final block index, (...,)
    digest = jnp.take_along_axis(
        states, sel[..., None, None], axis=-2
    )[..., 0, :]
    return words_to_bytes(digest)


def words_to_bytes(words):
    """(..., k) uint32 big-endian words -> (..., 4k) byte values (uint32)."""
    b = jnp.stack(
        [(words >> 24) & 0xFF, (words >> 16) & 0xFF, (words >> 8) & 0xFF, words & 0xFF],
        axis=-1,
    )
    return b.reshape(words.shape[:-1] + (words.shape[-1] * 4,))
