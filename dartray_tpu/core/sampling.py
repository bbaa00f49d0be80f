"""Monte-Carlo sampling utilities, fully vectorized for device execution.

TPU-native replacement for lib/core/montecarlo.dart (656 LoC) and
lib/core/rng.dart. The reference's stateful RNG is replaced by counter-based
hashing (deterministic in (pixel, sample-index, dimension, seed) — SURVEY §7
"Determinism across shard counts"), and its (0,2)-sequence bit tricks
(montecarlo.dart:486-556) are reproduced bit-exactly as uint32 vector ops —
pure integer math that maps directly onto the TPU VPU.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32
ONE_MINUS_EPS = jnp.float32(np.nextafter(1.0, 0.0, dtype=np.float32))


# --- Counter-based hashing RNG --------------------------------------------

def hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Finalizer-style integer hash (murmur3 fmix32). x: uint32 array."""
    x = x.astype(U32)
    x ^= x >> 16
    x *= U32(0x7feb352d)
    x ^= x >> 15
    x *= U32(0x846ca68b)
    x ^= x >> 16
    return x


def hash_combine(a, b):
    a = a.astype(U32) if hasattr(a, "astype") else U32(a)
    return hash_u32(a ^ (U32(0x9e3779b9) + (jnp.asarray(b, U32) << 6)))


def index_permute(i: jnp.ndarray, n: int, key) -> jnp.ndarray:
    """Deterministic pseudo-random permutation of [0, n) (Kensler's
    cycle-walking hash bijection, as used for correlated multi-jitter).

    Replaces the reference's LDShuffleScrambled1D/2D shuffles
    (montecarlo.dart:524-556): scrambled (0,2) points at different dimensions
    are XOR-related, so each dimension group must draw the sequence in an
    independent order or joint (multi-dim) integrands converge to biased
    values. Vectorized: the do-while cycle walk becomes a fixed re-mix loop.
    """
    if n <= 1:
        return jnp.zeros_like(i)
    w = n - 1
    w |= w >> 1
    w |= w >> 2
    w |= w >> 4
    w |= w >> 8
    w |= w >> 16
    wj = U32(w)
    p = jnp.broadcast_to(jnp.asarray(key, U32), i.shape)
    i = i.astype(U32) & wj

    def mix(x):
        x ^= p
        x *= U32(0xe170893d)
        x ^= p >> 16
        x ^= (x & wj) >> 4
        x ^= p >> 8
        x *= U32(0x0929eb3f)
        x ^= p >> 23
        x ^= (x & wj) >> 1
        x *= U32(1) | (p >> 27)
        x *= U32(0x6935fa69)
        x ^= (x & wj) >> 11
        x *= U32(0x74dcb303)
        x ^= (x & wj) >> 2
        x *= U32(0x9e501cc3)
        x ^= (x & wj) >> 2
        x *= U32(0xc860a3df)
        x &= wj
        x ^= x >> 5
        return x

    x = mix(i)
    for _ in range(7):  # cycle walk: re-mix lanes that landed >= n
        x = jnp.where(x >= U32(n), mix(x), x)
    x = jnp.where(x >= U32(n), i, x)  # astronomically rare fallback
    return ((x + p) % U32(n)).astype(jnp.uint32)


def uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 in [0, 1). Uses the top 24 bits."""
    return jnp.minimum((bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24)),
                       ONE_MINUS_EPS)


def rng_uniform(key: jnp.ndarray, counter) -> jnp.ndarray:
    """Deterministic uniform [0,1) from (key, counter) uint32 pairs."""
    return uniform_from_bits(hash_u32(key.astype(U32) ^ hash_u32(jnp.asarray(counter, U32))))


# --- (0,2)-sequence: Sobol'/van-der-Corput (montecarlo.dart:486-556) ------

def van_der_corput(n: jnp.ndarray, scramble) -> jnp.ndarray:
    """Bit-reversed base-2 radical inverse with XOR scramble
    (montecarlo.dart VanDerCorput). n, scramble: uint32 arrays."""
    n = n.astype(U32)
    n = (n << 16) | (n >> 16)
    n = ((n & U32(0x00ff00ff)) << 8) | ((n & U32(0xff00ff00)) >> 8)
    n = ((n & U32(0x0f0f0f0f)) << 4) | ((n & U32(0xf0f0f0f0)) >> 4)
    n = ((n & U32(0x33333333)) << 2) | ((n & U32(0xcccccccc)) >> 2)
    n = ((n & U32(0x55555555)) << 1) | ((n & U32(0xaaaaaaaa)) >> 1)
    n ^= jnp.asarray(scramble, U32)
    return jnp.minimum(n.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                       ONE_MINUS_EPS)


def sobol2(n: jnp.ndarray, scramble) -> jnp.ndarray:
    """Second Sobol' dimension (montecarlo.dart Sobol2): generator-matrix XOR
    fold. The reference's per-bit loop becomes a fixed 32-step unrolled fold —
    static control flow, pure uint ops."""
    n = n.astype(U32)
    s = jnp.broadcast_to(jnp.asarray(scramble, U32), n.shape)
    v = U32(1 << 31)
    for i in range(32):
        bit = (n >> i) & U32(1)
        s = s ^ (bit * v)
        v ^= v >> 1
    return jnp.minimum(s.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                       ONE_MINUS_EPS)


def sample02(n: jnp.ndarray, scramble2):
    """(0,2)-sequence 2D sample (montecarlo.dart Sample02).

    scramble2: pair (s0, s1) of uint32 arrays, or a (..., 2) uint32 array.
    Returns V2 float32."""
    from . import math as vm
    if isinstance(scramble2, (tuple, list, vm.V2)):
        s0, s1 = scramble2[0], scramble2[1]
    else:
        s0, s1 = scramble2[..., 0], scramble2[..., 1]
    return vm.V2(van_der_corput(n, s0), sobol2(n, s1))


def ld_shuffle_scrambled_1d(n_samples_log2_rounded: int):
    raise NotImplementedError  # covered by samplers.py wave layouts


# --- Radical inverse / Halton (montecarlo.dart:327-405) -------------------

_PRIMES = np.array([
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
    71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149,
    151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229],
    np.int64)


def radical_inverse(n: jnp.ndarray, base: int) -> jnp.ndarray:
    """Radical inverse in arbitrary base (montecarlo.dart:327). Fixed-trip
    fori_loop: ceil(log_base(2^32)) digits."""
    n_digits = int(np.ceil(32 / np.log2(base))) + 1
    inv_base = jnp.float32(1.0 / base)

    def body(_, carry):
        val, inv_bi, nn = carry
        d = (nn % base).astype(jnp.float32)
        return (val + d * inv_bi, inv_bi * inv_base, nn // base)

    val, _, _ = jax.lax.fori_loop(
        0, n_digits, body,
        (jnp.zeros(n.shape, jnp.float32), jnp.full(n.shape, inv_base),
         n.astype(jnp.int32)))
    return jnp.minimum(val, ONE_MINUS_EPS)


def permuted_radical_inverse(n: jnp.ndarray, base: int, perm: jnp.ndarray):
    """PermutedHalton digit-scrambled radical inverse (montecarlo.dart:363).
    perm: (base,) int32 digit permutation (device array)."""
    n_digits = int(np.ceil(32 / np.log2(base))) + 1
    inv_base = jnp.float32(1.0 / base)

    def body(_, carry):
        val, inv_bi, nn = carry
        d = perm[(nn % base)].astype(jnp.float32)
        return (val + d * inv_bi, inv_bi * inv_base, nn // base)

    val, _, _ = jax.lax.fori_loop(
        0, n_digits, body,
        (jnp.zeros(n.shape, jnp.float32), jnp.full(n.shape, inv_base),
         n.astype(jnp.int32)))
    return jnp.minimum(val, ONE_MINUS_EPS)


def halton_permutations(n_dims: int, seed: int = 0):
    """Host-side random digit permutations for PermutedHalton."""
    rng = np.random.RandomState(seed)
    perms = []
    for i in range(n_dims):
        b = int(_PRIMES[i])
        perms.append(jnp.asarray(rng.permutation(b), jnp.int32))
    return [int(_PRIMES[i]) for i in range(n_dims)], perms


# --- Geometric sampling transforms (montecarlo.dart:100-221) --------------
# Directions return component-SoA V3; 2D samples accept V2 or (..., 2).

def _u2(u):
    from . import math as vm
    return vm.from_arr2(u)


def uniform_sample_hemisphere(u):
    """2D sample -> V3 direction, pdf = 1/(2pi)."""
    from . import math as vm
    u = _u2(u)
    z = u.x
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u.y
    return vm.V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_sample_sphere(u):
    from . import math as vm
    u = _u2(u)
    z = 1.0 - 2.0 * u.x
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u.y
    return vm.V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


UNIFORM_SPHERE_PDF = float(1.0 / (4.0 * np.pi))
UNIFORM_HEMISPHERE_PDF = float(1.0 / (2.0 * np.pi))


def uniform_sample_disk(u):
    u = _u2(u)
    r = jnp.sqrt(u.x)
    theta = 2.0 * jnp.pi * u.y
    return r * jnp.cos(theta), r * jnp.sin(theta)


def concentric_sample_disk(u):
    """Shirley-Chiu concentric disk mapping (montecarlo.dart
    ConcentricSampleDisk), branch-free via jnp.where over the 4 wedges."""
    u = _u2(u)
    sx = 2.0 * u.x - 1.0
    sy = 2.0 * u.y - 1.0
    zero = (sx == 0.0) & (sy == 0.0)
    abs_x_big = jnp.abs(sx) > jnp.abs(sy)
    r = jnp.where(abs_x_big, sx, sy)
    safe = lambda a, b: a / jnp.where(jnp.abs(b) < 1e-30, 1.0, b)
    theta = jnp.where(abs_x_big,
                      (jnp.pi / 4.0) * safe(sy, sx),
                      (jnp.pi / 2.0) - (jnp.pi / 4.0) * safe(sx, sy))
    r = jnp.where(zero, 0.0, r)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def cosine_sample_hemisphere(u):
    """pdf = cos(theta)/pi. Returns V3."""
    from . import math as vm
    x, y = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return vm.V3(x, y, z)


def cosine_hemisphere_pdf(costheta):
    return costheta * jnp.float32(1.0 / np.pi)


def uniform_sample_cone(u, cos_theta_max):
    """Sample direction in cone around +z (montecarlo.dart UniformSampleCone)."""
    from . import math as vm
    u = _u2(u)
    costheta = (1.0 - u.x) + u.x * cos_theta_max
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    phi = u.y * 2.0 * jnp.pi
    return vm.V3(jnp.cos(phi) * sintheta, jnp.sin(phi) * sintheta, costheta)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_theta_max, 1e-8))


def uniform_sample_triangle(u):
    """Barycentric (u1, u2) sampling (montecarlo.dart UniformSampleTriangle)."""
    u = _u2(u)
    su1 = jnp.sqrt(u.x)
    return 1.0 - su1, u.y * su1


def sample_hg(w, u, g):
    """Henyey-Greenstein phase sampling (montecarlo.dart SampleHG).
    w: V3 outgoing; returns V3."""
    from . import math as vm
    u = _u2(u)
    w = vm.from_arr(w)
    g = jnp.asarray(g)
    iso = jnp.abs(g) < 1e-3
    sq = (1.0 - g * g) / jnp.where(
        jnp.abs(1.0 - g + 2.0 * g * u.x) < 1e-12, 1.0,
        1.0 - g + 2.0 * g * u.x)
    costheta_hg = (1.0 + g * g - sq * sq) / jnp.where(jnp.abs(2.0 * g) < 1e-12,
                                                      1.0, 2.0 * g)
    costheta = jnp.where(iso, 1.0 - 2.0 * u.x, costheta_hg)
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    phi = 2.0 * jnp.pi * u.y
    v1, v2 = vm.coordinate_system(w)
    return vm.spherical_direction_basis(sintheta, costheta, phi, v1, v2, w)


def hg_pdf(cos_theta, g):
    """HG phase function value (volume.dart PhaseHG)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (1.0 / (4.0 * jnp.pi)) * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


# --- MIS heuristics (montecarlo.dart:476-484) -----------------------------

def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / jnp.maximum(nf * f_pdf + ng * g_pdf, 1e-30)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / jnp.maximum(f * f + g * g, 1e-30)


# --- Stratified / LHS / shuffle (montecarlo.dart:270-325) -----------------

def stratified_sample_1d(n: int, key, jitter=True):
    """n stratified samples in [0,1). key: uint32 scalar (per pixel)."""
    i = jnp.arange(n, dtype=U32)
    u = rng_uniform(jnp.broadcast_to(jnp.asarray(key, U32), (n,)), i) if jitter \
        else jnp.full((n,), 0.5, jnp.float32)
    return jnp.minimum((i.astype(jnp.float32) + u) / n, ONE_MINUS_EPS)


def stratified_sample_2d(nx: int, ny: int, key):
    ix = jnp.arange(nx, dtype=jnp.float32)
    iy = jnp.arange(ny, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(ix, iy, indexing="xy")
    flat = jnp.arange(nx * ny, dtype=U32)
    keyb = jnp.broadcast_to(jnp.asarray(key, U32), (nx * ny,))
    jx = rng_uniform(keyb, flat * U32(2))
    jy = rng_uniform(keyb, flat * U32(2) + U32(1))
    sx = jnp.minimum((gx.reshape(-1) + jx) / nx, ONE_MINUS_EPS)
    sy = jnp.minimum((gy.reshape(-1) + jy) / ny, ONE_MINUS_EPS)
    return jnp.stack([sx, sy], axis=-1)


def shuffle_permutation(n: int, key):
    """Deterministic pseudo-random permutation of [0,n) from a uint32 key.
    Sort-of-random keys -> argsort (device-friendly Fisher-Yates stand-in)."""
    i = jnp.arange(n, dtype=U32)
    k = hash_u32(jnp.broadcast_to(jnp.asarray(key, U32), (n,)) ^ hash_u32(i))
    return jnp.argsort(k)


def latin_hypercube(n: int, dims: int, key):
    """LHS samples (montecarlo.dart LatinHypercube): jittered diagonal with
    per-dimension shuffles."""
    delta = 1.0 / n
    i = jnp.arange(n, dtype=U32)
    cols = []
    for d in range(dims):
        keyb = jnp.asarray(key, U32) + U32(7919 * d)
        u = rng_uniform(jnp.broadcast_to(keyb, (n,)), i)
        vals = jnp.minimum((i.astype(jnp.float32) + u) * delta, ONE_MINUS_EPS)
        perm = shuffle_permutation(n, keyb ^ U32(0xabcdef01))
        cols.append(vals[perm])
    return jnp.stack(cols, axis=-1)


# --- Distribution1D / Distribution2D (montecarlo.dart:26-98, 223-268) -----

class Distribution1D:
    """Piecewise-constant 1D distribution on device arrays.

    func: (n,) nonneg; builds cdf (n+1,). sample_continuous/discrete are
    searchsorted-based — O(log n) per sample, fully batched.
    """

    def __init__(self, func):
        # HOST-side construction (numpy): building eagerly with jnp runs
        # every cumsum/where as a device op — ~100 ms each over a tunneled
        # chip, hundreds of seconds per scene. Traced (tracer) funcs keep
        # the jnp path for in-jit construction.
        if isinstance(func, jax.core.Tracer):
            xp = jnp
            func = func.astype(jnp.float32)
        else:
            xp = np
            func = np.asarray(func, np.float32)
        n = func.shape[-1]
        cdf = xp.concatenate([xp.zeros(func.shape[:-1] + (1,), xp.float32),
                              xp.cumsum(func / n, axis=-1)], axis=-1)
        total = cdf[..., -1:]
        # Degenerate (all-zero) distributions fall back to uniform.
        uniform_cdf = xp.linspace(0.0, 1.0, n + 1, dtype=xp.float32)
        uniform_cdf = xp.broadcast_to(uniform_cdf, cdf.shape)
        self.degenerate = total[..., 0] == 0.0
        self.cdf = xp.where(self.degenerate[..., None], uniform_cdf,
                            cdf / xp.where(total == 0.0, 1.0, total))
        self.func = xp.where(self.degenerate[..., None], xp.ones_like(func),
                             func)
        self.func_int = xp.where(self.degenerate, 1.0 / n, total[..., 0])
        self.n = n

    def sample_continuous(self, u):
        """u: (...,) -> (x in [0,1), pdf, offset)."""
        offset = jnp.clip(
            jnp.searchsorted(self.cdf, u, side="right") - 1, 0, self.n - 1)
        cdf_lo = jnp.take(self.cdf, offset, axis=-1)
        cdf_hi = jnp.take(self.cdf, offset + 1, axis=-1)
        du = (u - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, 1e-30)
        f = jnp.take(self.func, offset, axis=-1)
        pdf = f / jnp.maximum(self.func_int, 1e-30)
        x = (offset.astype(jnp.float32) + du) / self.n
        return x, pdf, offset

    def sample_discrete(self, u):
        """-> (offset, pdf_of_offset)."""
        offset = jnp.clip(
            jnp.searchsorted(self.cdf, u, side="right") - 1, 0, self.n - 1)
        f = jnp.take(self.func, offset, axis=-1)
        pdf = f / jnp.maximum(self.func_int * self.n, 1e-30)
        return offset, pdf

    def pdf_discrete(self, offset):
        f = jnp.take(self.func, offset, axis=-1)
        return f / jnp.maximum(self.func_int * self.n, 1e-30)


class Distribution2D:
    """2D distribution: row-conditional + marginal (montecarlo.dart:223-268).

    Stored as flat device arrays so it can live inside a jitted scene pytree:
      cond_cdf (nv, nu+1), cond_func (nv, nu), cond_int (nv,),
      marg_cdf (nv+1,), marg_func (nv,), marg_int ().
    """

    def __init__(self, func2d):
        # host-side numpy unless traced (see Distribution1D — eager jnp
        # construction is a remote-compile per op on a tunneled chip)
        if not isinstance(func2d, jax.core.Tracer):
            func2d = np.asarray(func2d, np.float32)  # (nv, nu)
        nv, nu = func2d.shape
        self.nu, self.nv = nu, nv
        cond = Distribution1D(func2d)             # batched over rows
        self.cond_cdf = cond.cdf                  # (nv, nu+1)
        self.cond_func = cond.func
        self.cond_int = cond.func_int             # (nv,)
        marg = Distribution1D(self.cond_int)
        self.marg_cdf = marg.cdf
        self.marg_func = marg.func
        self.marg_int = marg.func_int

    def sample_continuous(self, u):
        """u: (..., 2) -> ((..., 2) uv, pdf)."""
        u0, u1 = u[..., 0], u[..., 1]
        # marginal over v
        v_off = jnp.clip(jnp.searchsorted(self.marg_cdf, u1, side="right") - 1,
                         0, self.nv - 1)
        mlo = self.marg_cdf[v_off]
        mhi = self.marg_cdf[v_off + 1]
        dv = (u1 - mlo) / jnp.maximum(mhi - mlo, 1e-30)
        pdf_v = self.marg_func[v_off] / jnp.maximum(self.marg_int, 1e-30)
        v = (v_off.astype(jnp.float32) + dv) / self.nv
        # conditional over u given row v_off — per-sample row gather
        row_cdf = self.cond_cdf[v_off]            # (..., nu+1)
        u_off = jnp.clip(
            jax.vmap(lambda c, x: jnp.searchsorted(c, x, side="right"))(
                row_cdf.reshape(-1, self.nu + 1), u0.reshape(-1)
            ).reshape(u0.shape) - 1, 0, self.nu - 1)
        clo = jnp.take_along_axis(row_cdf, u_off[..., None], axis=-1)[..., 0]
        chi = jnp.take_along_axis(row_cdf, u_off[..., None] + 1, axis=-1)[..., 0]
        du = (u0 - clo) / jnp.maximum(chi - clo, 1e-30)
        f = self.cond_func[v_off, u_off]
        pdf_u = f / jnp.maximum(self.cond_int[v_off], 1e-30)
        uu = (u_off.astype(jnp.float32) + du) / self.nu
        return jnp.stack([uu, v], axis=-1), pdf_u * pdf_v

    def pdf(self, u, v):
        iu = jnp.clip((u * self.nu).astype(jnp.int32), 0, self.nu - 1)
        iv = jnp.clip((v * self.nv).astype(jnp.int32), 0, self.nv - 1)
        return self.cond_func[iv, iu] / jnp.maximum(self.marg_int, 1e-30)
