"""Geodesy: WGS84 LLA <-> ECEF <-> local ENU.

Re-designs the reference's GPS coordinate-frame utilities
(``GSLAM/core/GPS.h``, used by drone-mapping datasets and GPS prior edges
in pose-graph optimization) as batched array functions.  Angles in degrees
at the API (matching GPS data files), meters elsewhere.

Precision note (TPU design decision): ECEF magnitudes are ~6.4e6 m, where
float32 resolution is ~0.5 m.  Device-side use (GPS residuals in BA /
pose graph) therefore always works in *local ENU* coordinates, which are
small and f32-exact; the LLA->ENU origin rebase happens host-side in
float64.  Every function takes ``xp`` (numpy or jax.numpy): pass
``xp=numpy`` on the host for f64 precision, default jnp on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as _np

WGS84_A = 6378137.0            # semi-major axis (m)
WGS84_F = 1.0 / 298.257223563  # flattening
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared


def lla_to_ecef(lla, xp=jnp):
    """(..., 3) [lat_deg, lon_deg, alt_m] -> ECEF (..., 3) meters."""
    lla = xp.asarray(lla)
    lat = xp.radians(lla[..., 0])
    lon = xp.radians(lla[..., 1])
    alt = lla[..., 2]
    slat, clat = xp.sin(lat), xp.cos(lat)
    n = WGS84_A / xp.sqrt(1.0 - WGS84_E2 * slat * slat)
    x = (n + alt) * clat * xp.cos(lon)
    y = (n + alt) * clat * xp.sin(lon)
    z = (n * (1.0 - WGS84_E2) + alt) * slat
    return xp.stack([x, y, z], axis=-1)


def ecef_to_lla(ecef, iters: int = 5, xp=jnp):
    """ECEF (..., 3) -> [lat_deg, lon_deg, alt_m] (Bowring iteration)."""
    ecef = xp.asarray(ecef)
    x, y, z = ecef[..., 0], ecef[..., 1], ecef[..., 2]
    lon = xp.arctan2(y, x)
    p = xp.sqrt(xp.clip(x * x + y * y, 1e-12, None))
    lat = xp.arctan2(z, p * (1.0 - WGS84_E2))
    for _ in range(iters):
        slat = xp.sin(lat)
        n = WGS84_A / xp.sqrt(1.0 - WGS84_E2 * slat * slat)
        alt = p / xp.cos(lat) - n
        lat = xp.arctan2(z, p * (1.0 - WGS84_E2 * n / (n + alt)))
    slat = xp.sin(lat)
    n = WGS84_A / xp.sqrt(1.0 - WGS84_E2 * slat * slat)
    alt = p / xp.cos(lat) - n
    return xp.stack([xp.degrees(lat), xp.degrees(lon), alt], axis=-1)


def _enu_rotation(lat_deg, lon_deg, xp=jnp):
    """ECEF->ENU rotation (..., 3, 3) at the given origin."""
    lat = xp.radians(lat_deg)
    lon = xp.radians(lon_deg)
    sl, cl = xp.sin(lon), xp.cos(lon)
    sp, cp = xp.sin(lat), xp.cos(lat)
    rows = xp.stack([
        -sl, cl, xp.zeros_like(sl),
        -sp * cl, -sp * sl, cp,
        cp * cl, cp * sl, sp,
    ], axis=-1)
    return rows.reshape(*rows.shape[:-1], 3, 3)


def ecef_to_enu(ecef, origin_lla, xp=jnp):
    """ECEF points (..., 3) -> ENU meters relative to origin [lat,lon,alt]."""
    origin_lla = xp.asarray(origin_lla)
    o_ecef = lla_to_ecef(origin_lla, xp=xp)
    R = _enu_rotation(origin_lla[..., 0], origin_lla[..., 1], xp=xp)
    d = xp.asarray(ecef) - o_ecef
    return (R @ d[..., None])[..., 0]


def enu_to_ecef(enu, origin_lla, xp=jnp):
    origin_lla = xp.asarray(origin_lla)
    o_ecef = lla_to_ecef(origin_lla, xp=xp)
    R = _enu_rotation(origin_lla[..., 0], origin_lla[..., 1], xp=xp)
    return o_ecef + (xp.swapaxes(R, -1, -2) @ xp.asarray(enu)[..., None])[..., 0]


def lla_to_enu(lla, origin_lla, xp=jnp):
    """[lat, lon, alt] -> local ENU meters (the GPS-edge measurement).

    For metric accuracy call with ``xp=numpy`` (f64) on the host; see
    module precision note.
    """
    return ecef_to_enu(lla_to_ecef(lla, xp=xp), origin_lla, xp=xp)


def enu_to_lla(enu, origin_lla, xp=jnp):
    return ecef_to_lla(enu_to_ecef(enu, origin_lla, xp=xp), xp=xp)


def lla_to_enu_np(lla, origin_lla):
    """Host-precision (float64 numpy) LLA -> ENU."""
    return lla_to_enu(_np.asarray(lla, _np.float64),
                      _np.asarray(origin_lla, _np.float64), xp=_np)
