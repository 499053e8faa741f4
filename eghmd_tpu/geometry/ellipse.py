"""Batched ellipse / conic algebra.

Semantics mirror the reference implementation's `my_ellipse` class and
`ElliFit` solver (reference: helperfunctions.py:13-310) but are written as
pure, batched, array-module-agnostic functions: every function takes an
optional ``xp`` argument which may be ``numpy`` (host pipeline, float64) or
``jax.numpy`` (on-device, jit-able). All functions broadcast over arbitrary
leading batch dimensions.

Parameter convention (same as the reference): ``param = [cx, cy, a, b, theta]``
where ``(cx, cy)`` is the center, ``a``/``b`` the semi-axes along the rotated
x/y directions, and ``theta`` the anticlockwise rotation in radians.

Conic convention: a symmetric 3x3 matrix ``M`` such that points on the
ellipse satisfy ``[x, y, 1] @ M @ [x, y, 1]^T == 0``, normalized so that the
value at the center equals -1 (this is what ``param_to_conic`` produces and
what affine transforms preserve).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS_B = 1e-40  # |b| threshold in theta recovery (reference helperfunctions.py:10,105-116)


def _mat33(e00, e01, e02, e10, e11, e12, e20, e21, e22, xp):
    """Build [..., 3, 3] from broadcastable scalar entries."""
    e = xp.broadcast_arrays(e00, e01, e02, e10, e11, e12, e20, e21, e22)
    row0 = xp.stack(e[0:3], axis=-1)
    row1 = xp.stack(e[3:6], axis=-1)
    row2 = xp.stack(e[6:9], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def rotation_2d(theta, xp=jnp):
    """Anticlockwise 2D rotation as a 3x3 homogeneous matrix.

    Mirrors reference helperfunctions.py:313-317. Batched over leading dims.
    """
    theta = xp.asarray(theta)
    c, s = xp.cos(theta), xp.sin(theta)
    z = xp.zeros_like(c)
    o = xp.ones_like(c)
    return _mat33(c, -s, z, s, c, z, z, z, o, xp)


def translation_2d(cx, cy, xp=jnp):
    """Homogeneous translation matrix (reference helperfunctions.py:319-321)."""
    cx = xp.asarray(cx)
    cy = xp.asarray(cy)
    z = xp.zeros_like(cx)
    o = xp.ones_like(cx)
    return _mat33(o, z, cx, z, o, cy, z, z, o, xp)


def scale_2d(sx, sy, xp=jnp):
    """Homogeneous scale matrix (reference helperfunctions.py:323-325)."""
    sx = xp.asarray(sx)
    sy = xp.asarray(sy)
    z = xp.zeros_like(sx)
    o = xp.ones_like(sx)
    return _mat33(sx, z, z, z, sy, z, z, z, o, xp)


def param_to_conic(param, xp=jnp):
    """[..., 5] params -> [..., 3, 3] conic matrix.

    Mirrors reference helperfunctions.py:25-33 (``my_ellipse.param2mat``):
    ``M = T^T R^T diag(1/a^2, 1/b^2, -1) R T`` with ``R = rot(-theta)`` and
    ``T = trans(-cx, -cy)``.
    """
    param = xp.asarray(param)
    cx, cy, a, b, theta = (param[..., i] for i in range(5))
    h_rot = rotation_2d(-theta, xp)
    h_trans = translation_2d(-cx, -cy, xp)
    inv_a2 = 1.0 / (a * a)
    inv_b2 = 1.0 / (b * b)
    z = xp.zeros_like(a)
    q = _mat33(inv_a2, z, z, z, inv_b2, z, z, z, -xp.ones_like(a), xp)
    rt = h_rot @ h_trans
    return xp.swapaxes(rt, -1, -2) @ q @ rt


def conic_to_quad(mat, xp=jnp):
    """[..., 3, 3] conic -> [..., 6] (a, b, c, d, e, f) quadric coefficients.

    Mirrors reference helperfunctions.py:35-38.
    """
    return xp.stack(
        [mat[..., 0, 0], 2 * mat[..., 0, 1], mat[..., 1, 1],
         2 * mat[..., 0, 2], 2 * mat[..., 1, 2], mat[..., 2, 2]],
        axis=-1,
    )


def _recover_theta(quad, xp):
    """Ellipse rotation from quadric coeffs (reference helperfunctions.py:102-116)."""
    a, b, c = quad[..., 0], quad[..., 1], quad[..., 2]
    small_b = xp.abs(b) <= _EPS_B
    theta_ab = xp.where(a <= c, xp.zeros_like(a), xp.full_like(a, 0.5 * jnp.pi))
    theta_gen = 0.5 * xp.arctan2(b, a - c)
    return xp.where(small_b, theta_ab, theta_gen)


def _recover_center(quad, xp):
    """Ellipse center from quadric coeffs (reference helperfunctions.py:118-122)."""
    a, b, c, d, e = (quad[..., i] for i in range(5))
    den = b * b - 4 * a * c
    tx = (2 * c * d - b * e) / den
    ty = (2 * a * e - b * d) / den
    return tx, ty


def conic_to_param(mat, xp=jnp):
    """[..., 3, 3] conic -> [..., 5] params ``[cx, cy, a, b, theta]``.

    Mirrors reference helperfunctions.py:50-63 (``my_ellipse.mat2param``)
    with one robustness addition: the recentred matrix is normalized by its
    (2, 2) entry, which equals exactly -1 for conics produced by
    ``param_to_conic`` and their affine transforms (where the reference
    implicitly assumes -1), and makes this function additionally correct for
    arbitrarily scaled conic matrices.
    """
    mat = xp.asarray(mat)
    quad = conic_to_quad(mat, xp)
    theta = _recover_theta(quad, xp)
    tx, ty = _recover_center(quad, xp)
    h_rot = rotation_2d(theta, xp)
    h_trans = translation_2d(tx, ty, xp)
    ht = h_trans @ h_rot
    mat_norm = xp.swapaxes(ht, -1, -2) @ mat @ ht
    scale = -mat_norm[..., 2, 2]  # == +1 for canonical conics
    a_axis = xp.sqrt(scale / mat_norm[..., 0, 0])
    b_axis = xp.sqrt(scale / mat_norm[..., 1, 1])
    return xp.stack([tx, ty, a_axis, b_axis, theta], axis=-1)


def transform_ellipse(param, H, xp=jnp):
    """Apply an affine transform ``H`` ([..., 3, 3]) to ellipse params ([..., 5]).

    Same semantics as reference helperfunctions.py:124-129
    (``my_ellipse.transform``: conic transforms as ``M' = inv(H)^T M inv(H)``)
    but computed in a recentred form that is exact for affine ``H`` (last row
    [0, 0, 1] — true of every H the reference uses: normalize/unnormalize/
    scale/flip) and numerically stable in float32: the center maps directly
    through ``H`` while the centered 2x2 quadratic form maps through the
    linear part of ``inv(H)``, avoiding the catastrophic cancellation of
    recovering the center from full conic coefficients.
    """
    param = xp.asarray(param)
    H = xp.asarray(H)
    cx, cy, a, b, theta = (param[..., i] for i in range(5))

    # center: c' = H @ [cx, cy, 1] (elementwise: keeps full float32 precision —
    # jnp matmul/einsum default to reduced accumulation precision on some
    # backends, which is unacceptable for pixel coordinates)
    cx_t = H[..., 0, 0] * cx + H[..., 0, 1] * cy + H[..., 0, 2]
    cy_t = H[..., 1, 0] * cx + H[..., 1, 1] * cy + H[..., 1, 2]

    # centered form: Sigma = R(-theta)^T diag(1/a^2, 1/b^2) R(-theta)
    co, si = xp.cos(theta), xp.sin(theta)
    ia2, ib2 = 1.0 / (a * a), 1.0 / (b * b)
    s00 = ia2 * co * co + ib2 * si * si
    s01 = (ia2 - ib2) * co * si
    s11 = ia2 * si * si + ib2 * co * co

    # Sigma' = L^T Sigma L with L = inverse of the linear (2x2) part of H —
    # equal to the linear part of inv(H) for affine H. Closed-form 2x2 inverse.
    a00, a01 = H[..., 0, 0], H[..., 0, 1]
    a10, a11 = H[..., 1, 0], H[..., 1, 1]
    det = a00 * a11 - a01 * a10
    l00, l01 = a11 / det, -a01 / det
    l10, l11 = -a10 / det, a00 / det
    t00 = l00 * s00 + l10 * s01
    t01 = l01 * s00 + l11 * s01
    t10 = l00 * s01 + l10 * s11
    t11 = l01 * s01 + l11 * s11
    q_a = l00 * t00 + l10 * t10
    q_b2 = l00 * t01 + l10 * t11  # == Sigma'_01
    q_c = l01 * t01 + l11 * t11

    quad = xp.stack([q_a, 2 * q_b2, q_c], axis=-1)
    theta_t = _recover_theta(quad, xp)
    co_t, si_t = xp.cos(theta_t), xp.sin(theta_t)
    # D = R(theta)^T Sigma' R(theta); a' = 1/sqrt(D00), b' = 1/sqrt(D11)
    d00 = q_a * co_t * co_t + 2 * q_b2 * co_t * si_t + q_c * si_t * si_t
    d11 = q_a * si_t * si_t - 2 * q_b2 * co_t * si_t + q_c * co_t * co_t
    a_t = 1.0 / xp.sqrt(d00)
    b_t = 1.0 / xp.sqrt(d11)
    return xp.stack([cx_t, cy_t, a_t, b_t, theta_t], axis=-1)


def ellifit(points, xp=jnp, weights=None):
    """Direct least-squares ellipse fit (batched ElliFit).

    ``points``: [..., N, 2] boundary points -> [..., 5] params, and the
    Phi vector [..., 5].

    Mirrors reference helperfunctions.py:229-265 with two deviations:
      * batched normal-equation solve instead of a python loop;
      * the axis-length term uses the full ElliFit expression
        ``phi4 + y0^2 + x0^2*phi0 + 2*phi1*x0*y0`` — the reference drops the
        ``x0*y0`` factor (helperfunctions.py:252), a latent upstream bug that
        only matters when the fitted center is far from the data centroid.

    Invalid fits (non-finite axes) return ``[-1, -1, -1, -1, -1]`` like the
    reference (helperfunctions.py:261-265).
    """
    points = xp.asarray(points)
    xm = xp.mean(points[..., 0], axis=-1, keepdims=True)
    ym = xp.mean(points[..., 1], axis=-1, keepdims=True)
    x = points[..., 0] - xm
    y = points[..., 1] - ym
    ones = xp.ones_like(x)
    X = xp.stack([x * x, 2 * x * y, -2 * x, -2 * y, -ones], axis=-1)  # [..., N, 5]
    Y = -y * y  # [..., N]
    if weights is not None:
        w = xp.asarray(weights)[..., None]
        Xw = X * w
    else:
        Xw = X
    xtx = xp.swapaxes(Xw, -1, -2) @ X  # [..., 5, 5]
    xty = xp.einsum("...nk,...n->...k", Xw, Y)  # [..., 5]
    phi = xp.linalg.solve(xtx, xty[..., None])[..., 0]

    param = phi_to_param(phi, xm[..., 0], ym[..., 0], xp)
    return param, phi


def phi_to_param(phi, xm, ym, xp=jnp):
    """ElliFit Phi vector -> ellipse params (reference helperfunctions.py:248-265)."""
    p0, p1, p2, p3, p4 = (phi[..., i] for i in range(5))
    den = p0 - p1 * p1
    x0 = (p2 - p3 * p1) / den
    y0 = (p0 * p3 - p2 * p1) / den
    term1 = 1 + p0
    term2 = xp.sqrt((1 - p0) ** 2 + 4 * p1 * p1)
    term3 = p4 + y0 * y0 + x0 * x0 * p0 + 2 * p1 * x0 * y0
    b = xp.sqrt(2 * term3 / (term1 + term2))
    a = xp.sqrt(2 * term3 / (term1 - term2))
    alpha = 0.5 * xp.arctan2(2 * p1, 1 - p0)
    param = xp.stack([x0 + xm, y0 + ym, a, b, -alpha], axis=-1)
    ok = xp.all(xp.isfinite(param), axis=-1, keepdims=True)
    return xp.where(ok, param, -xp.ones_like(param))


def fit_error(points, param, xp=jnp):
    """|algebraic residual| of points against an ellipse.

    Role of reference helperfunctions.py:267-276 (``ElliFit.fit_error``), but
    with the rotation sense corrected: the reference rotates the deltas by
    +theta (treating the stored angle as clockwise), which makes its residual
    nonzero even for its own exact fits. We rotate by -theta, consistent with
    the anticlockwise convention used everywhere else in this module, so the
    residual of points exactly on the ellipse is 0.

    points: [..., N, 2], param: [..., 5] -> [..., N].
    """
    points = xp.asarray(points)
    param = xp.asarray(param)
    cx, cy, a, b, theta = (param[..., i, None] for i in range(5))
    dx = points[..., 0] - cx
    dy = points[..., 1] - cy
    c, s = xp.cos(theta), xp.sin(theta)
    u = dx * c + dy * s
    v = -dx * s + dy * c
    res = (u / a) ** 2 + (v / b) ** 2 - 1
    return xp.abs(res)


_EQUIANGLE_T = [-0.75, -0.5, -0.25, 0.0, 0.25, 0.5, 0.75, 1.0]  # units of pi


def generate_points_equiangle(param, xp=jnp):
    """8 points along the ellipse periphery at angles [0:45:360).

    Mirrors reference helperfunctions.py:183-193 (``generatePoints`` with
    mode='equiAngle'). param: [..., 5] -> [..., 8, 2].
    """
    param = xp.asarray(param)
    t = xp.asarray(_EQUIANGLE_T, dtype=param.dtype) * jnp.pi
    cx, cy, a, b, theta = (param[..., i, None] for i in range(5))
    x = a * xp.cos(t)
    y = b * xp.sin(t)
    c, s = xp.cos(theta), xp.sin(theta)
    xr = c * x - s * y + cx
    yr = s * x + c * y + cy
    return xp.stack([xr, yr], axis=-1)


def norm_mat(height, width, xp=jnp, dtype=None):
    """Pixel -> normalized [-1, 1] coordinate homography.

    Mirrors the H built at reference CurriculumLib.py:159 and test.py usage:
    ``[[2/W, 0, -1], [0, 2/H, -1], [0, 0, 1]]``.
    """
    m = xp.asarray(
        [[2.0 / width, 0.0, -1.0], [0.0, 2.0 / height, -1.0], [0.0, 0.0, 1.0]]
    )
    return m.astype(dtype) if dtype is not None else m


def unnorm_mat(height, width, xp=jnp, dtype=None):
    """Normalized [-1, 1] -> pixel coordinate homography.

    Mirrors the H built at reference utils.py:249 / evaluate.py:141:
    ``[[W/2, 0, W/2], [0, H/2, H/2], [0, 0, 1]]``.
    """
    m = xp.asarray(
        [[width / 2.0, 0.0, width / 2.0], [0.0, height / 2.0, height / 2.0], [0.0, 0.0, 1.0]]
    )
    return m.astype(dtype) if dtype is not None else m


def get_ellipse_info(param, H, cond, xp=jnp):
    """Normalize ellipse params by homography H and canonicalize axes.

    Mirrors reference helperfunctions.py:488-518: transform to normalized
    coordinates, generate 8 periphery points, and if the transformed
    major-axis entry exceeds the minor-axis entry, swap axes and add pi/2 to
    theta so that ``param[3] >= param[2]`` always holds.

    ``cond`` is truthy when the ellipse annotation is MISSING (reference
    convention); missing entries return -1 fills.

    Returns (pts [..., 8, 2], norm_param [..., 5]).
    """
    param = xp.asarray(param)
    cond = xp.asarray(cond)
    np_t = transform_ellipse(param, H, xp)
    pts = generate_points_equiangle(np_t, xp)
    swap = np_t[..., 2] > np_t[..., 3]
    a_new = xp.where(swap, np_t[..., 3], np_t[..., 2])
    b_new = xp.where(swap, np_t[..., 2], np_t[..., 3])
    th_new = xp.where(swap, np_t[..., 4] + 0.5 * jnp.pi, np_t[..., 4])
    np_c = xp.stack([np_t[..., 0], np_t[..., 1], a_new, b_new, th_new], axis=-1)
    missing = cond[..., None]
    norm_param = xp.where(missing, -xp.ones_like(np_c), np_c)
    pts = xp.where(missing[..., None], -xp.ones_like(pts), pts)
    return pts, norm_param


def generate_points_equislope(param, xp=jnp):
    """8 points along the periphery with tangential slopes [1e-6, 1, 1000, -1].

    Mirrors reference helperfunctions.py:166-180 (``generatePoints`` with
    mode='equiSlope'), bit-for-bit including its convention quirk: the
    formula treats theta as CLOCKWISE, so the produced points lie on the
    ellipse with NEGATED angle (verified in tests/test_losses_extra.py) —
    unlike mode='equiAngle', which is anticlockwise. Kept faithful since
    downstream reference consumers assume this exact output.
    param: [..., 5] -> [..., 8, 2].
    """
    param = xp.asarray(param)
    cx, cy, a, b, theta = (param[..., i, None] for i in range(5))
    alpha = (a * xp.sin(theta)) ** 2 + (b * xp.cos(theta)) ** 2
    beta = (a * xp.cos(theta)) ** 2 + (b * xp.sin(theta)) ** 2
    gamma = (a ** 2 - b ** 2) * xp.sin(2 * theta)
    m = xp.asarray([1e-6, 1.0, 1000.0, -1.0], dtype=param.dtype)
    k = (m * gamma + 2 * alpha) / (2 * beta * m + gamma)
    x2 = ((a * b) ** 2) / (alpha + beta * k ** 2 - gamma * k)
    xs = xp.sqrt(x2)
    x = xp.stack([xs, -xs], axis=-1).reshape(*xs.shape[:-1], 8)
    y = -x * xp.stack([k, k], axis=-1).reshape(*k.shape[:-1], 8)
    return xp.stack([x + cx, y + cy], axis=-1)


def generate_points_random(param, n, rng=None, xp=jnp, key=None):
    """N random points on the ellipse periphery.

    Mirrors reference helperfunctions.py:195-202 (mode='random').
    numpy path uses ``rng`` (RandomState); jnp path uses ``key``.
    """
    param = xp.asarray(param)
    cx, cy, a, b, theta = (param[..., i, None] for i in range(5))
    shape = param.shape[:-1] + (n,)
    if xp is jnp:
        import jax

        key = key if key is not None else jax.random.PRNGKey(0)
        t = 2 * jnp.pi * (jax.random.uniform(key, shape) - 0.5)
    else:
        rng = rng or __import__("numpy").random.RandomState(0)
        t = 2 * xp.pi * (rng.rand(*shape) - 0.5)
    x = a * xp.cos(t)
    y = b * xp.sin(t)
    c, s = xp.cos(theta), xp.sin(theta)
    return xp.stack([c * x - s * y + cx, s * x + c * y + cy], axis=-1)


def verify_ellipse(param, pts, xp=jnp):
    """Mean algebraic residual of points against the ellipse's conic matrix.

    Mirrors reference helperfunctions.py:138-149 (``my_ellipse.verify``):
    mean over homogeneous points p of p @ C @ p^T (inf for empty input).
    param: [5]; pts: [N, 2] -> scalar.
    """
    pts = xp.asarray(pts)
    n = pts.shape[0]
    if n == 0:
        return xp.asarray(float("inf"))
    mat = param_to_conic(xp.asarray(param), xp)
    ph = xp.concatenate([pts, xp.ones_like(pts[..., :1])], axis=-1)  # [N, 3]
    # broadcasted elementwise form (keeps the geometry path off the MXU,
    # where reduced default precision would hurt fp32 parity)
    res = xp.sum(xp.sum(ph[:, None, :] * mat, axis=-1) * ph, axis=-1)
    return xp.sum(res) / n
