"""Scalar float32 oracle renderer.

A direct, per-pixel, recursive NumPy-float32 model of the reference renderer's
*semantics* (msakuta/ray-rust), used as the golden stand-in: the Rust toolchain
is not available in this environment, so parity of the batched TPU renderer is
checked against this scalar implementation, which follows the reference control
flow step by step (citations inline). It is deliberately slow and simple.

All arithmetic is kept in np.float32 (NumPy 2 NEP-50 keeps f32 through Python
scalar operands).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

f32 = np.float32
INF = f32(np.inf)
EPS = f32(np.finfo(np.float32).eps)
PI = f32(np.pi)

# flags (render.rs:14-18)
OUTONLY = 1
INONLY = 2
RIGNORE = 4
GIGNORE = 8
BIGNORE = 16

MAX_REFLECTIONS = 3  # render.rs:11
MAX_REFRACTIONS = 10  # render.rs:12
RAYMARCH_EPS = f32(1e-3)  # render.rs:1253
FAR_AWAY = f32(1e4)  # render.rs:1254
MAX_ITER = 10000  # render.rs:1255


class V:
    __slots__ = ("x", "y", "z")

    def __init__(self, x, y, z):
        self.x, self.y, self.z = f32(x), f32(y), f32(z)

    def dot(self, o):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def __add__(self, o):
        return V(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return V(self.x - o.x, self.y - o.y, self.z - o.z)

    def scale(self, s):
        s = f32(s)
        return V(self.x * s, self.y * s, self.z * s)

    def length(self):
        return f32(np.sqrt(self.dot(self)))

    def normalized(self):
        ln = self.length()
        return V(self.x / ln, self.y / ln, self.z / ln)


class Q:
    __slots__ = ("x", "y", "z", "w")

    def __init__(self, x, y, z, w):
        self.x, self.y, self.z, self.w = f32(x), f32(y), f32(z), f32(w)

    def mul(self, o):
        a, b = self, o  # quat.rs:63-72
        return Q(
            a.y * b.z - a.z * b.y + a.x * b.w + a.w * b.x,
            a.z * b.x - a.x * b.z + a.y * b.w + a.w * b.y,
            a.x * b.y - a.y * b.x + a.z * b.w + a.w * b.z,
            -a.x * b.x - a.y * b.y - a.z * b.z + a.w * b.w,
        )

    def conj(self):
        return Q(-self.x, -self.y, -self.z, self.w)

    def transform(self, v):  # quat.rs:74-80
        qr = self.mul(Q(v.x, v.y, v.z, 0.0))
        qret = qr.mul(self.conj())
        return V(qret.x, qret.y, qret.z)

    @staticmethod
    def rotation(p, sx, sy, sz):  # quat.rs:92-95
        p = f32(p)
        s = f32(np.sin(p / f32(2.0)))
        return Q(s * f32(sx), s * f32(sy), s * f32(sz), f32(np.cos(p / f32(2.0))))

    @staticmethod
    def from_pyr(pyr):  # quat.rs:129-134
        mx = Q.rotation(pyr.z, 1, 0, 0)
        my = Q.rotation(pyr.y, 0, 0, 1)
        mp = Q.rotation(pyr.x, 0, 1, 0)
        return mx.mul(my).mul(mp)


def fmod(f, freq):  # modutil.rs:1-3
    f, freq = f32(f), f32(freq)
    return f - np.floor(f / freq) * freq


def imod(i, freq):  # modutil.rs:4-6
    return int(i) - int(np.floor(f32(i) / f32(freq))) * int(freq)


def umod(i, freq):  # modutil.rs:7-9
    return imod(i, freq)


def fimod(f, freq):  # modutil.rs:10-14
    fm = fmod(f, freq)
    fi = np.floor(fm)
    return fm - fi, umod(int(fm), int(freq))


@dataclasses.dataclass
class OMat:
    diffuse: tuple
    specular: tuple
    pn: int
    t: float
    n: float
    glow_dist: float = 0.0
    pattern: str = "solid"  # solid | checkerboard | gradation
    pattern_scale: float = 1.0
    pattern_angle_scale: float = 1.0
    texture: Optional[np.ndarray] = None  # (H,W,3) u8
    texture_filter: str = "nearest"


@dataclasses.dataclass
class OObj:
    kind: str  # sphere | floor
    mat: OMat
    org: V
    r: float = 0.0
    normal: V = None
    uvmap: str = "XY"


@dataclasses.dataclass
class OEnv:
    camera_pos: V
    camera_rot: Q
    xres: int
    yres: int
    xfov: float
    yfov: float
    objects: List[OObj]
    light: V
    bg: Callable
    use_raymarching: bool = False
    glow_effect: Optional[float] = None
    max_reflections: int = MAX_REFLECTIONS
    max_refractions: int = MAX_REFRACTIONS


def default_sky(env, d):  # main.rs:231-260
    phi = f32(np.arctan2(d.z, d.x))
    the = f32(np.arcsin(d.y))
    dd1 = f32(np.fmod(f32(50.0) * PI + phi * f32(10.0) * PI, f32(2.0) * PI)) - PI
    dd2 = f32(np.fmod(f32(50.0) * PI + the * f32(10.0) * PI, f32(2.0) * PI)) - PI
    ret = [
        f32(0.5) / (f32(15.0) * (dd1 * dd1 * dd2 * dd2) + f32(1.0)),
        f32(0.25) - d.y / f32(4.0),
        f32(0.25) - d.y / f32(4.0),
    ]
    dot = env.light.dot(d)
    if dot > f32(0.9):
        if f32(0.9995) < dot:
            return [f32(2.0)] * 3
        if f32(0.995) < dot:
            dd = (dot - f32(0.995)) * f32(150.0)
            ret = [ret[0] + dd, ret[1] + dd, ret[2] + dd]
        dot2 = dot - f32(0.9)
        return [ret[0] + dot2 * f32(5.0), ret[1] + dot2 * f32(5.0), ret[2]]
    return ret


def obj_raycast(obj: OObj, vi: V, eye: V, ray_length, flags) -> f32:
    if obj.kind == "sphere":  # render.rs:447-471
        wpt = vi - obj.org
        b = f32(2.0) * eye.dot(wpt)
        c = wpt.dot(wpt) - f32(obj.r) * f32(obj.r)
        d2 = b * b - f32(4.0) * c
        if d2 >= EPS:
            d = f32(np.sqrt(d2))
            t0 = (-b - d) / f32(2.0)
            if 0 == (flags & OUTONLY) and t0 >= 0.0 and t0 < ray_length:
                return t0
            elif 0 == (flags & INONLY) and 0.0 < (t0 + d) and t0 + d < ray_length:
                return t0 + d
        return ray_length
    else:  # floor, render.rs:557-569
        wpt = vi - obj.org
        w = obj.normal.dot(eye)
        if w <= 0.0:
            with np.errstate(divide="ignore", invalid="ignore"):
                t0 = (-obj.normal.dot(wpt)) / w
            if t0 >= 0.0 and t0 < ray_length:
                return t0
        return ray_length


def obj_distance(obj: OObj, vi: V) -> f32:
    if obj.kind == "sphere":  # render.rs:473-475
        return max((obj.org - vi).length() - f32(obj.r), f32(0.0))
    return max((vi - obj.org).dot(obj.normal), f32(0.0))  # render.rs:571-573


def obj_normal(obj: OObj, pos: V) -> V:
    if obj.kind == "sphere":  # render.rs:443-445
        return (pos - obj.org).normalized()
    return obj.normal  # render.rs:553-555


def get_uv(mat: OMat, pos: V, uvmap: str):  # render.rs:220-233
    ps = f32(mat.pattern_scale)
    if uvmap == "XY":
        return pos.x / ps, pos.y / ps
    if uvmap == "YZ":
        return pos.y / ps, pos.z / ps
    if uvmap == "ZX":
        return pos.z / ps, pos.x / ps
    pas = f32(mat.pattern_angle_scale)
    return (
        f32(np.arctan2(pos.z, pos.x)) / pas,
        f32(np.arctan2(np.sqrt(pos.x * pos.x + pos.z * pos.z), pos.y)) / pas,
    )


def lookup_texture(mat: OMat, u, v):  # render.rs:249-316
    if mat.texture is not None:
        tex = mat.texture
        h, w = tex.shape[0], tex.shape[1]
        if mat.texture_filter == "nearest":  # render.rs:253-266
            px = tex[imod(int(v * f32(h)), h), imod(int(u * f32(w)), w)]
            return [f32(px[0]) / f32(256.0), f32(px[1]) / f32(256.0), f32(px[2]) / f32(256.0)]
        fu, iu = fimod(u * f32(w), f32(w))  # render.rs:267-296
        fv, iv = fimod(v * f32(h), f32(h))
        p00 = tex[iv, iu].astype(np.float32)
        p01 = tex[umod(iv + 1, h), iu].astype(np.float32)
        p10 = tex[iv, umod(iu + 1, w)].astype(np.float32)
        p11 = tex[umod(iv + 1, h), umod(iu + 1, w)].astype(np.float32)
        px = (
            (f32(1.0) - fu) * (f32(1.0) - fv) * p00
            + (f32(1.0) - fu) * fv * p01
            + fu * (f32(1.0) - fv) * p10
            + fu * fv * p11
        )
        return [f32(px[0]) / f32(256.0), f32(px[1]) / f32(256.0), f32(px[2]) / f32(256.0)]
    if mat.pattern == "solid":
        return [f32(c) for c in mat.diffuse]
    if mat.pattern == "checkerboard":  # render.rs:301-309
        ix = int(np.floor(u))
        iy = int(np.floor(v))
        if (ix + iy) % 2 == 0:
            return [f32(0.0)] * 3
        return [f32(c) for c in mat.diffuse]
    # gradation (render.rs:310-314)
    return [f32(mat.diffuse[0]) * fmod(u, 1.0), f32(mat.diffuse[1]) * fmod(v, 1.0), f32(mat.diffuse[2])]


def raycast(env: OEnv, vi: V, eye: V, ig, flags):  # render.rs:993-1018
    t = INF
    ret_idx = 0
    for idx, obj in enumerate(env.objects):
        if ig is not None and idx == ig:
            continue
        obj_t = obj_raycast(obj, vi, eye, t, flags)
        if obj_t < t:
            t = obj_t
            ret_idx = idx
    return t, ret_idx


def distance_estimate(env: OEnv, vi: V, ig):  # render.rs:1226-1251
    closest = INF
    ret_idx = 0
    glowing = INF
    for idx, obj in enumerate(env.objects):
        if ig is not None and idx == ig:
            continue
        dist = obj_distance(obj, vi)
        if dist < closest:
            closest = dist
            ret_idx = idx
        glow = dist * f32(obj.mat.glow_dist)
        if 0.0 < glow < glowing:
            glowing = glow
    return closest, ret_idx, glowing


def raymarch_single(env: OEnv, init_pos: V, eye: V, ig):  # render.rs:1266-1297
    it = 0
    travel = f32(0.0)
    pos = init_pos
    min_dist = INF
    while True:
        dist, idx, glowing = distance_estimate(env, pos, ig)
        pos = eye.scale(dist) + pos
        travel = travel + dist
        it += 1
        if glowing < min_dist:
            min_dist = glowing
        if dist < RAYMARCH_EPS or FAR_AWAY < dist or MAX_ITER < it:
            return dist, idx, pos, it, travel, min_dist


def shading(env: OEnv, idx, n: V, pt: V, eye: V, nest):  # render.rs:1020-1140
    obj = env.objects[idx]
    li = env.light.dot(n)
    ln2 = f32(2.0) * li
    rtl = V(n.x * ln2 - env.light.x, n.y * ln2 - env.light.y, n.z * ln2 - env.light.z)
    diffuse_intensity = max(li, f32(0.0))
    reflected_ray = pt + env.light.scale(EPS)
    pn = obj.mat.pn
    if pn != 0:
        ri = -rtl.dot(eye)
        reflection_intensity = f32(ri) ** pn if ri > 0.0 else f32(0.0)
    else:
        reflection_intensity = f32(0.0)

    # shadow (render.rs:1048-1082)
    k1 = f32(0.2)
    if env.use_raymarching:
        _, _, _, it, travel, _ = raymarch_single(env, reflected_ray, env.light, idx)
        lit = FAR_AWAY <= travel or MAX_ITER <= it or 0.0 < f32(obj.mat.t)
    else:
        t, i = raycast(env, reflected_ray, env.light, idx, 0)
        lit = t >= INF or 0.0 < f32(env.objects[i].mat.t)
    if lit:
        k1 = min(k1 + diffuse_intensity, f32(1.0))
        k2 = reflection_intensity
    else:
        k2 = f32(0.0)

    u, v = get_uv(obj.mat, pt - obj.org, obj.uvmap)
    kd = lookup_texture(obj.mat, u, v)

    if nest < env.max_refractions and 0.0 < f32(obj.mat.t):  # render.rs:1093-1132
        sp = eye.dot(n)
        fmat = f32(obj.mat.t)
        frac = f32(obj.mat.n)
        reference = sp * ((frac if sp > 0.0 else f32(1.0) / frac) - f32(1.0))
        ray = (eye + n.scale(reference)).normalized()
        pt3 = pt + ray.scale(EPS)
        fn = raymarch if env.use_raymarching else raytrace
        fc2 = fn(env, pt3, ray, nest, idx, OUTONLY if sp < 0.0 else INONLY)
        return [
            (kd[0] * k1 + k2) * (f32(1.0) - fmat) + fc2[0] * fmat,
            (kd[1] * k1 + k2) * (f32(1.0) - fmat) + fc2[1] * fmat,
            (kd[2] * k1 + k2) * (f32(1.0) - fmat) + fc2[2] * fmat,
        ]
    return [kd[0] * k1 + k2, kd[1] * k1 + k2, kd[2] * k1 + k2]


def raytrace(env: OEnv, vi: V, eye: V, lev, ig, flags):  # render.rs:1142-1224
    fcs = [f32(1.0)] * 3
    ret = [f32(0.0)] * 3
    while True:
        lev += 1
        t, idx = raycast(env, vi, eye, ig, flags)
        if t < INF:
            pt = eye.scale(t) + vi
            obj = env.objects[idx]
            n = obj_normal(obj, pt)
            face = shading(env, idx, n, pt, eye, lev)
            ks = obj.mat.specular
            if 0 == (RIGNORE & flags):
                ret[0] = ret[0] + face[0] * fcs[0]
                fcs[0] = fcs[0] * f32(ks[0])
            if 0 == (GIGNORE & flags):
                ret[1] = ret[1] + face[1] * fcs[1]
                fcs[1] = fcs[1] * f32(ks[1])
            if 0 == (BIGNORE & flags):
                ret[2] = ret[2] + face[2] * fcs[2]
                fcs[2] = fcs[2] * f32(ks[2])
            if idx == 0:
                break
            if (fcs[0] + fcs[1] + fcs[2]) <= 0.1:
                break
            if lev >= env.max_reflections:
                break
            vi = pt
            en2 = f32(-2.0) * eye.dot(n)
            eye = eye + n.scale(en2)
            if n.dot(eye) < 0.0:
                flags = (flags & ~INONLY) | OUTONLY
            else:
                flags = (flags & ~OUTONLY) | INONLY
            ig = idx
        else:
            fc2 = env.bg(env, eye)
            ret[0] = ret[0] + fc2[0] * fcs[0]
            ret[1] = ret[1] + fc2[1] * fcs[1]
            ret[2] = ret[2] + fc2[2] * fcs[2]
        if not (t < INF and lev < env.max_reflections):
            break
    return ret


def raymarch(env: OEnv, vi: V, eye: V, lev, ig, flags):  # render.rs:1299-1411
    fcs = [f32(1.0)] * 3
    ret = [f32(0.0)] * 3
    pos = vi
    min_min_dist = INF
    while True:
        lev += 1
        final_dist, idx, pt, it, travel, min_dist = raymarch_single(env, pos, eye, ig)
        if min_dist < min_min_dist:
            min_min_dist = min_dist
        if final_dist < RAYMARCH_EPS:
            obj = env.objects[idx]
            n = obj_normal(obj, pt)
            face = shading(env, idx, n, pt, eye, lev)
            ks = obj.mat.specular
            if 0 == (RIGNORE & flags):
                ret[0] = ret[0] + face[0] * fcs[0]
                fcs[0] = fcs[0] * f32(ks[0])
            if 0 == (GIGNORE & flags):
                ret[1] = ret[1] + face[1] * fcs[1]
                fcs[1] = fcs[1] * f32(ks[1])
            if 0 == (BIGNORE & flags):
                ret[2] = ret[2] + face[2] * fcs[2]
                fcs[2] = fcs[2] * f32(ks[2])
            if idx == 0:
                break
            if (fcs[0] + fcs[1] + fcs[2]) <= 0.1:
                break
            if lev >= MAX_REFLECTIONS:
                break
            pos = pt
            en2 = f32(-2.0) * eye.dot(n)
            eye = eye + n.scale(en2)
            if n.dot(eye) < 0.0:
                flags = (flags & ~INONLY) | OUTONLY
            else:
                flags = (flags & ~OUTONLY) | INONLY
            ig = idx
        else:
            fc2 = env.bg(env, eye)
            ret[0] = ret[0] + fc2[0] * fcs[0]
            ret[1] = ret[1] + fc2[1] * fcs[1]
            ret[2] = ret[2] + fc2[2] * fcs[2]
        if MAX_REFLECTIONS <= lev:
            break
    if env.glow_effect is not None:
        if min_min_dist == INF:
            factor = f32(1.0)
        else:
            factor = f32(1.0) + f32(env.glow_effect) * f32(0.99) ** min_min_dist
        return [factor * c for c in ret]
    return ret


def render_oracle(env: OEnv) -> np.ndarray:
    """Full-frame scalar render -> (H, W, 3) float32 (render.rs:801-835)."""
    out = np.zeros((env.yres, env.xres, 3), np.float32)
    for iy in range(env.yres):
        for ix in range(env.xres):
            eye = V(
                1.0,
                f32(ix - env.xres // 2) * f32(2.0) * f32(env.xfov) / f32(env.xres),
                -f32(iy - env.yres // 2) * f32(2.0) * f32(env.yfov) / f32(env.yres),
            )
            eye = env.camera_rot.transform(eye).normalized()
            vi = env.camera_pos
            fn = raymarch if env.use_raymarching else raytrace
            out[iy, ix] = fn(env, vi, eye, 0, None, 0)
    return out


def default_env(xres, yres, use_raymarching=False, glow_effect=None) -> OEnv:
    """The reference default scene (main.rs:154-276), oracle flavor."""
    floor = OMat(
        diffuse=(1.0, 1.0, 0.0), specular=(0.0, 0.0, 0.0), pn=0, t=0.0, n=0.0,
        pattern="gradation", pattern_scale=300.0, pattern_angle_scale=0.2,
    )
    mirror = OMat(diffuse=(0.0, 0.0, 0.0), specular=(1.0, 1.0, 1.0), pn=24, t=0.0, n=0.0)
    red = OMat(diffuse=(0.8, 0.0, 0.0), specular=(0.0, 0.0, 0.0), pn=24, t=0.0, n=0.0,
               glow_dist=5.0)
    transparent = OMat(diffuse=(0.0, 0.0, 0.0), specular=(0.0, 0.0, 0.0), pn=0, t=1.0, n=1.5)
    objects = [
        OObj("floor", floor, V(0, -300, 0), normal=V(0, 1, 0), uvmap="ZX"),
        OObj("sphere", mirror, V(0, -30, 172), r=80),
        OObj("sphere", mirror, V(-200, -30, 172), r=80),
        OObj("sphere", red, V(-200, -200, 172), r=80),
        OObj("sphere", transparent, V(70, -200, 150), r=100),
    ]
    pyr = V(0.0, -np.pi / 2.0, -np.pi / 2.0)
    return OEnv(
        camera_pos=V(0, -150, -300),
        camera_rot=Q.from_pyr(pyr),
        xres=xres,
        yres=yres,
        xfov=1.0,
        yfov=yres / xres,
        objects=objects,
        light=V(50, 60, -50).normalized(),
        bg=default_sky,
        use_raymarching=use_raymarching,
        glow_effect=glow_effect,
    )
