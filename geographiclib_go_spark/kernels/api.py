"""Reference-parity scalar API over the vectorized kernels.

Mirrors the public surface of pymaxion/geographiclib-go: Geodesic
(Direct/ArcDirect/Inverse ± WithCapabilities ≡ the ``caps`` kwarg,
Line/DirectLine/ArcDirectLine/InverseLine), Line (Position/ArcPosition/
SetDistance/SetArc/Distance/Arc), PolygonArea (AddPoint/AddEdge/
Compute/TestPoint/TestEdge/CurrentPoint, polyline mode), and Gnomonic
(Forward/Reverse).  Everything delegates to the batch kernels with
size-1 arrays; the Spark engine never uses this layer in the hot path —
it exists for API parity and as the oracle for the UDF tests.

Reference citations: geodesic.go:296-525, line.go:40-480,
polygon.go:29-339, gnomonic.go:73-173, data.go:8-93.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import direct as kdirect
from geographiclib_go_spark.kernels import geomath as gm
from geographiclib_go_spark.kernels import gnomonic as kgnomonic
from geographiclib_go_spark.kernels import inverse as kinverse
from geographiclib_go_spark.kernels import polygon as kpolygon
from geographiclib_go_spark.kernels.geodesic import (
    GeodesicModel, WGS84_A, WGS84_F)

NAN = math.nan


@dataclass
class Data:
    """The universal 12-field result record (data.go:8-93); unset
    fields are NaN."""
    lat1: float = NAN
    lon1: float = NAN
    azi1: float = NAN
    lat2: float = NAN
    lon2: float = NAN
    azi2: float = NAN
    s12: float = NAN
    a12: float = NAN
    m12: float = NAN  # reduced length
    M12: float = NAN  # geodesic scale
    M21: float = NAN
    S12: float = NAN  # area under the geodesic


def _scalar(x) -> float:
    return float(np.asarray(x).reshape(-1)[0])


def _data_from(out: dict) -> Data:
    d = Data()
    for k_out, k_data in (("lat1", "lat1"), ("lon1", "lon1"),
                          ("azi1", "azi1"), ("lat2", "lat2"),
                          ("lon2", "lon2"), ("azi2", "azi2"),
                          ("s12", "s12"), ("a12", "a12"), ("m12", "m12"),
                          ("M12", "M12"), ("M21", "M21"),
                          ("S12area", "S12")):
        if k_out in out:
            setattr(d, k_data, _scalar(out[k_out]))
    return d


class Geodesic:
    """Ellipsoid solver façade (geodesic.go:140-525)."""

    def __init__(self, a: float = WGS84_A, f: float = WGS84_F):
        self.model = GeodesicModel(a, f)

    # accessors (geodesic.go:259-274)
    @property
    def equatorial_radius(self) -> float:
        return self.model.a

    @property
    def flattening(self) -> float:
        return self.model.f

    @property
    def ellipsoid_area(self) -> float:
        return self.model.ellipsoid_area

    # --- direct problem ---------------------------------------------------
    def direct(self, lat1, lon1, azi1, s12, caps: int = C.STANDARD) -> Data:
        a = [np.array([float(v)]) for v in (lat1, lon1, azi1, s12)]
        out = kdirect.direct(self.model, a[0], a[1], a[2], a[3], caps)
        d = _data_from(out)
        if not (caps & C.AZIMUTH):
            d.azi1 = NAN
            d.azi2 = NAN
        return d

    def arc_direct(self, lat1, lon1, azi1, a12,
                   caps: int = C.STANDARD) -> Data:
        a = [np.array([float(v)]) for v in (lat1, lon1, azi1, a12)]
        out = kdirect.arc_direct(self.model, a[0], a[1], a[2], a[3], caps)
        d = _data_from(out)
        if not (caps & C.AZIMUTH):
            d.azi1 = NAN
            d.azi2 = NAN
        return d

    # --- inverse problem --------------------------------------------------
    def inverse(self, lat1, lon1, lat2, lon2,
                caps: int = C.STANDARD) -> Data:
        a = [np.array([float(v)]) for v in (lat1, lon1, lat2, lon2)]
        out = kinverse.inverse(self.model, a[0], a[1], a[2], a[3], caps)
        return _data_from(out)

    # --- lines (geodesic.go:400-525) ---------------------------------------
    def line(self, lat1, lon1, azi1, caps: int = C.ALL) -> "Line":
        return Line(self, lat1, lon1, azi1, caps)

    def direct_line(self, lat1, lon1, azi1, s12,
                    caps: int = C.ALL) -> "Line":
        ln = Line(self, lat1, lon1, azi1, caps | C.DISTANCE_IN)
        ln.set_distance(float(s12))
        return ln

    def arc_direct_line(self, lat1, lon1, azi1, a12,
                        caps: int = C.ALL) -> "Line":
        ln = Line(self, lat1, lon1, azi1, caps | C.DISTANCE_IN)
        ln.set_arc(float(a12))
        return ln

    def inverse_line(self, lat1, lon1, lat2, lon2,
                     caps: int = C.ALL) -> "Line":
        """Line through the inverse solution with point 3 = point 2
        (geodesic.go:500-525)."""
        a = [np.array([float(v)]) for v in (lat1, lon1, lat2, lon2)]
        r = kinverse.gen_inverse(self.model, a[0], a[1], a[2], a[3],
                                 C.DISTANCE)
        salp1 = _scalar(r["salp1"])
        calp1 = _scalar(r["calp1"])
        azi1 = float(gm.atan2d(salp1, calp1))
        caps |= C.DISTANCE | C.DISTANCE_IN  # ensure a13->s13 works
        ln = Line(self, float(lat1), float(lon1), azi1, caps,
                  salp1=salp1, calp1=calp1)
        ln.set_arc(_scalar(r["a12"]))
        return ln

    def polygon_area(self, polyline: bool = False) -> "PolygonArea":
        return PolygonArea(self, polyline)


class Line:
    """A geodesic line with frozen point-1 state (line.go:40-194)."""

    def __init__(self, geod: Geodesic, lat1, lon1, azi1,
                 caps: int = C.ALL, salp1: float = None,
                 calp1: float = None):
        self.geod = geod
        sa = None if salp1 is None else np.array([salp1])
        ca = None if calp1 is None else np.array([calp1])
        self._L = kdirect.line_init(
            geod.model, np.array([float(lat1)]), np.array([float(lon1)]),
            np.array([float(azi1)]), caps, salp1=sa, calp1=ca)
        self.s13 = NAN
        self.a13 = NAN

    @property
    def caps(self) -> int:
        return self._L["mask"]

    @property
    def lat1(self) -> float:
        return _scalar(self._L["lat1"])

    @property
    def lon1(self) -> float:
        return _scalar(self._L["lon1"])

    @property
    def azi1(self) -> float:
        return float(gm.ang_normalize(_scalar(self._L["azi1"])))

    def position(self, s12, caps: int = C.STANDARD) -> Data:
        out = kdirect.solve_position(self.geod.model, self._L, False,
                                     np.array([float(s12)]), caps)
        d = _data_from(out)
        if not (caps & C.AZIMUTH):
            d.azi2 = NAN
        return d

    def arc_position(self, a12, caps: int = C.STANDARD) -> Data:
        out = kdirect.solve_position(self.geod.model, self._L, True,
                                     np.array([float(a12)]), caps)
        d = _data_from(out)
        if not (caps & C.AZIMUTH):
            d.azi2 = NAN
        return d

    def set_distance(self, s13: float):
        """Register point 3 by distance (line.go:459-462)."""
        self.s13 = float(s13)
        self.a13 = self.position(self.s13, C.NONE).a12

    def set_arc(self, a13: float):
        """Register point 3 by arc (line.go:467-470)."""
        self.a13 = float(a13)
        self.s13 = self.arc_position(self.a13, C.DISTANCE).s12

    @property
    def distance(self) -> float:
        return self.s13

    @property
    def arc(self) -> float:
        return self.a13


class _Accumulator:
    """Shewchuk double-double accumulator (accumulator.go:18-97)."""

    __slots__ = ("s", "t")

    def __init__(self, y: float = 0.0):
        self.s = y
        self.t = 0.0

    def set(self, y: float):
        self.s = y
        self.t = 0.0

    def sum(self) -> float:
        return self.s

    def sum_with(self, y: float) -> float:
        b = _Accumulator(self.s)
        b.t = self.t
        b.add(y)
        return b.sum()

    def add(self, y: float):
        y, u = _sum2s(y, self.t)
        self.s, self.t = _sum2s(y, self.s)
        if self.s == 0:
            self.s = u
        else:
            self.t += u

    def negate(self):
        self.s *= -1
        self.t *= -1

    def remainder(self, y: float):
        self.s = math.remainder(self.s, y)
        self.add(0.0)


def _sum2s(u: float, v: float):
    s = u + v
    up = s - v
    vpp = s - up
    up -= u
    vpp -= v
    t = -(up + vpp) if s != 0 else s
    return s, t


class PolygonArea:
    """Streaming polygon aggregator (polygon.go:29-258)."""

    def __init__(self, geod: Geodesic, polyline: bool = False):
        self.geod = geod
        self.polyline = polyline
        self.area0 = geod.model.ellipsoid_area
        self._caps = (kpolygon.POLYLINE_CAPS if polyline
                      else kpolygon.POLYGON_CAPS)
        self._perim = _Accumulator()
        self._area = None if polyline else _Accumulator()
        self.clear()

    def clear(self):
        self.num = 0
        self.crossings = 0
        self._perim.set(0.0)
        if self._area is not None:
            self._area.set(0.0)
        self.lat0 = self.lon0 = self.lat1 = self.lon1 = NAN

    def add_point(self, lat: float, lon: float):
        if self.num == 0:
            self.lat0 = self.lat1 = lat
            self.lon0 = self.lon1 = lon
        else:
            r = self.geod.inverse(self.lat1, self.lon1, lat, lon,
                                  self._caps)
            self._perim.add(r.s12)
            if not self.polyline:
                self._area.add(r.S12)
                self.crossings += int(kpolygon.transit(self.lon1, lon))
            self.lat1, self.lon1 = lat, lon
        self.num += 1

    def add_edge(self, azi: float, s: float):
        if self.num > 0:
            r = self.geod.direct(self.lat1, self.lon1, azi, s, self._caps)
            self._perim.add(r.s12)
            if not self.polyline:
                self._area.add(r.S12)
                self.crossings += int(
                    kpolygon.transit_direct(self.lon1, r.lon2))
            self.lat1, self.lon1 = r.lat2, r.lon2
            self.num += 1

    def current_point(self):
        return self.lat1, self.lon1

    def compute(self, reverse: bool = False, sign: bool = True):
        """(num, perimeter, area) — polygon.go:154-168."""
        if self.num < 2:
            return self.num, 0.0, (NAN if self.polyline else 0.0)
        if self.polyline:
            return self.num, self._perim.sum(), NAN
        r = self.geod.inverse(self.lat1, self.lon1, self.lat0, self.lon0,
                              self._caps)
        tmp = _Accumulator(self._area.s)
        tmp.t = self._area.t
        tmp.add(r.S12)
        crossings = self.crossings + int(
            kpolygon.transit(self.lon1, self.lon0))
        area = _area_reduce_acc(tmp, self.area0, crossings, reverse, sign)
        return self.num, self._perim.sum_with(r.s12), area

    def test_point(self, lat: float, lon: float, reverse: bool = False,
                   sign: bool = True):
        """What-if compute with a tentative vertex (polygon.go:185-218)."""
        if self.num == 0:
            return 1, 0.0, (NAN if self.polyline else 0.0)
        perimeter = self._perim.sum()
        temp = 0.0 if self.polyline else self._area.sum()
        crossings = self.crossings
        num = self.num + 1
        for i in range(1 if self.polyline else 2):
            r = self.geod.inverse(
                self.lat1 if i == 0 else lat,
                self.lon1 if i == 0 else lon,
                self.lat0 if i != 0 else lat,
                self.lon0 if i != 0 else lon,
                self._caps)
            perimeter += r.s12
            if not self.polyline:
                temp += r.S12
                crossings += int(kpolygon.transit(
                    self.lon1 if i == 0 else lon,
                    self.lon0 if i != 0 else lon))
        if self.polyline:
            return num, perimeter, NAN
        area = kpolygon.area_reduce(temp, self.area0, crossings,
                                    reverse, sign)
        return num, perimeter, area

    def test_edge(self, azi: float, s: float, reverse: bool = False,
                  sign: bool = True):
        """What-if compute with a tentative edge (polygon.go:235-258)."""
        if self.num == 0:
            return 0, NAN, NAN
        num = self.num + 1
        perimeter = self._perim.sum() + s
        if self.polyline:
            return num, perimeter, NAN
        temp = self._area.sum()
        crossings = self.crossings
        d = self.geod.direct(self.lat1, self.lon1, azi, s, self._caps)
        temp += d.S12
        crossings += int(kpolygon.transit_direct(self.lon1, d.lon2))
        crossings += int(kpolygon.transit(d.lon2, self.lon0))
        r = self.geod.inverse(d.lat2, d.lon2, self.lat0, self.lon0,
                              self._caps)
        perimeter += r.s12
        temp += r.S12
        area = kpolygon.area_reduce(temp, self.area0, crossings,
                                    reverse, sign)
        return num, perimeter, area


def _area_reduce_acc(acc: _Accumulator, area0: float, crossings: int,
                     reverse: bool, sign: bool) -> float:
    """areaReduceA (polygon.go:289-313) on a live accumulator."""
    acc.remainder(area0)
    if crossings & 1:
        acc.add((1 if acc.sum() < 0 else -1) * area0 / 2)
    if not reverse:
        acc.negate()
    if sign:
        if acc.sum() > area0 / 2:
            acc.add(-area0)
        elif acc.sum() <= -area0 / 2:
            acc.add(area0)
    else:
        if acc.sum() >= area0:
            acc.add(-area0)
        elif acc.sum() < 0:
            acc.add(area0)
    return 0.0 + acc.sum()


class Gnomonic:
    """Ellipsoidal gnomonic projection (gnomonic.go:73-173)."""

    def __init__(self, earth: Geodesic = None):
        self.earth = earth if earth is not None else WGS84

    def forward(self, lat0, lon0, lat, lon):
        out = kgnomonic.gnomonic_forward(
            self.earth.model, np.array([float(lat0)]),
            np.array([float(lon0)]), np.array([float(lat)]),
            np.array([float(lon)]))
        return {k: _scalar(v) for k, v in out.items()}

    def reverse(self, lat0, lon0, x, y):
        out = kgnomonic.gnomonic_reverse(
            self.earth.model, np.array([float(lat0)]),
            np.array([float(lon0)]), np.array([float(x)]),
            np.array([float(y)]))
        return {k: _scalar(v) for k, v in out.items()}


WGS84 = Geodesic(WGS84_A, WGS84_F)
