"""Transverse Mercator projection (USGS series formulas), array-native.

Used to rasterize fused (lat, lon, h) points into a UTM-gridded DSM
(reference: /root/reference/tools/Transverse_Mercator.py).  Written against the
NumPy API but jnp-compatible: pass jnp arrays to run the projection on device.

WHU-TLC projection parameters (reference WHU_TLC/readme.md:33-42):
  central meridian -135°, scale factor 0.9996, false easting 500000, WGS-84.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Ellipsoid:
    """Reference ellipsoid; defaults are WGS-84."""

    a: float = 6378137.000
    inv_f: float = 298.257223563

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e(self) -> float:
        return math.sqrt(2.0 * self.f - self.f * self.f)

    @property
    def sec_e(self) -> float:
        e2 = self.e * self.e
        return math.sqrt(e2 / (1.0 - e2))


WGS84 = Ellipsoid()


def _meridional_arc(a: float, e2: float, lat_rad):
    """Meridional arc length from the equator (series expansion)."""
    xp = jnp if isinstance(lat_rad, jnp.ndarray) else np
    e4 = e2 * e2
    e6 = e4 * e2
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat_rad
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * xp.sin(2 * lat_rad)
        + (15 * e4 / 256 + 45 * e6 / 1024) * xp.sin(4 * lat_rad)
        - (35 * e6 / 3072) * xp.sin(6 * lat_rad)
    )


@dataclasses.dataclass(frozen=True)
class TransverseMercator:
    """lat/lon ↔ Easting/Northing under a Transverse Mercator projection.

    API mirrors the reference's `proj(pts, reverse)` entry point
    (/root/reference/tools/Transverse_Mercator.py:80-92); `pts` has shape
    (..., 2) with [lat, lon] (degrees) forward or [E, N] (meters) reverse.
    """

    ellipsoid: Ellipsoid = WGS84
    lat_origin: float = 0.0
    lon_origin: float = 0.0
    scale_factor: float = 1.0
    false_easting: float = 500000.0
    false_northing: float = 0.0

    @classmethod
    def whu_tlc(cls) -> "TransverseMercator":
        """The WHU-TLC dataset projection (WHU_TLC/readme.md:33-42)."""
        return cls(WGS84, 0.0, -135.0, 0.9996, 500000.0, 0.0)

    @classmethod
    def utm_for(cls, lon: float) -> "TransverseMercator":
        """The UTM projection of the zone containing longitude `lon` — the
        series formulas are only accurate within a few degrees of the central
        meridian, so DSM rasterization must use the scene's own zone."""
        zone = int((lon + 180.0) // 6.0) + 1
        central = -183.0 + 6.0 * zone
        return cls(WGS84, 0.0, central, 0.9996, 500000.0, 0.0)

    def proj(self, pts, reverse: bool = False):
        pts = pts if isinstance(pts, jnp.ndarray) else np.asarray(pts)
        shape = pts.shape
        flat = pts.reshape(-1, 2)
        if reverse:
            out = self.en_to_latlon(flat[:, 0], flat[:, 1])
        else:
            out = self.latlon_to_en(flat[:, 0], flat[:, 1])
        xp = jnp if isinstance(pts, jnp.ndarray) else np
        return xp.stack(out, axis=-1).reshape(shape)

    def latlon_to_en(self, lat_deg, lon_deg):
        """Forward projection (USGS formulas; ref Transverse_Mercator.py:94-143)."""
        xp = jnp if isinstance(lat_deg, jnp.ndarray) else np
        a, e, sec_e = self.ellipsoid.a, self.ellipsoid.e, self.ellipsoid.sec_e
        e2 = e * e
        lat = lat_deg * (math.pi / 180.0)
        lon = lon_deg * (math.pi / 180.0)
        lat0 = self.lat_origin * math.pi / 180.0
        lon0 = self.lon_origin * math.pi / 180.0

        m0 = _meridional_arc(a, e2, np.float64(lat0))
        cos_lat, sin_lat, tan_lat = xp.cos(lat), xp.sin(lat), xp.tan(lat)
        t = tan_lat * tan_lat
        c = e2 * cos_lat * cos_lat / (1 - e2)
        aa = (lon - lon0) * cos_lat
        v = a / xp.sqrt(1 - e2 * sin_lat * sin_lat)
        m = _meridional_arc(a, e2, lat)

        a2 = aa * aa
        a3 = a2 * aa
        se2 = sec_e * sec_e
        east = self.false_easting + self.scale_factor * v * (
            aa + (1 - t + c) * a3 / 6 + (5 - 18 * t + t * t + 72 * c - 58 * se2) * a2 * a3 / 120
        )
        north = self.false_northing + self.scale_factor * (
            m - m0
            + v
            * tan_lat
            * (
                a2 / 2
                + (5 - t + 9 * c + 4 * c * c) * a2 * a2 / 24
                + (61 - 58 * t + t * t + 600 * c - 330 * se2) * a3 * a3 / 720
            )
        )
        return east, north

    def en_to_latlon(self, east, north):
        """Reverse projection (ref Transverse_Mercator.py:145-209)."""
        xp = jnp if isinstance(east, jnp.ndarray) else np
        a, e, sec_e = self.ellipsoid.a, self.ellipsoid.e, self.ellipsoid.sec_e
        e2 = e * e
        lat0 = self.lat_origin * math.pi / 180.0
        lon0 = self.lon_origin * math.pi / 180.0

        m0 = _meridional_arc(a, e2, np.float64(lat0))
        temp_e = math.sqrt(1 - e2)
        e1 = (1 - temp_e) / (1 + temp_e)
        m1 = m0 + (north - self.false_northing) / self.scale_factor
        u1 = m1 / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))

        e1_2 = e1 * e1
        lat1 = (
            u1
            + (3 * e1 / 2 - 27 * e1_2 * e1 / 32) * xp.sin(2 * u1)
            + (21 * e1_2 / 16 - 55 * e1_2 * e1_2 / 32) * xp.sin(4 * u1)
            + (151 * e1_2 * e1 / 96) * xp.sin(6 * u1)
            + (1097 * e1_2 * e1_2 / 512) * xp.sin(8 * u1)
        )

        temp = xp.sqrt(1 - e2 * xp.sin(lat1) * xp.sin(lat1))
        v1 = a / temp
        p1 = a * (1 - e2) / (temp * temp * temp)
        t1 = xp.tan(lat1) * xp.tan(lat1)
        c1 = (sec_e * xp.cos(lat1)) ** 2
        d = (east - self.false_easting) / (v1 * self.scale_factor)

        d2 = d * d
        d3 = d2 * d
        se2 = sec_e * sec_e
        lat = lat1 - (v1 * xp.tan(lat1) / p1) * (
            d2 / 2
            - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * se2) * d2 * d2 / 24
            + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * se2 - 3 * c1 * c1) * d3 * d3 / 720
        )
        lon = lon0 + (
            d
            - (1 + 2 * t1 + c1) * d3 / 6
            + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * se2 + 24 * t1 * t1) * d2 * d3 / 120
        ) / xp.cos(lat1)

        return lat * (180.0 / math.pi), lon * (180.0 / math.pi)
