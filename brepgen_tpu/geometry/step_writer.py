"""Minimal STEP (ISO 10303-21) writer for B-spline geometry.

The reference exports solids through OCC's ``write_step_file``
(``sample.py:367``). This native writer emits the fitted B-spline surfaces
and curves as ``B_SPLINE_SURFACE_WITH_KNOTS`` / ``B_SPLINE_CURVE_WITH_KNOTS``
entities inside a ``GEOMETRICALLY_BOUNDED_SURFACE_SHAPE_REPRESENTATION`` --
a valid AP203 geometric representation readable by mainstream CAD tools.
(Full topological ADVANCED_BREP with trimmed faces/sewn shells is the OCC
backend's job when pythonocc is installed; see ``occ_backend.py``.)
"""

from __future__ import annotations

from typing import List

import numpy as np

from brepgen_tpu.geometry.bspline import BsplineCurve, BsplineSurface, knots_with_multiplicity


def _fmt(x: float) -> str:
    return f"{float(x):.10g}"


class _StepFile:
    def __init__(self):
        self.entities: List[str] = []

    def add(self, text: str) -> int:
        self.entities.append(text)
        return len(self.entities)  # 1-based ids

    def ref(self, eid: int) -> str:
        return f"#{eid}"


def _cartesian_points(sf: _StepFile, pts: np.ndarray) -> List[int]:
    return [
        sf.add(f"CARTESIAN_POINT('',({_fmt(p[0])},{_fmt(p[1])},{_fmt(p[2])}))")
        for p in pts
    ]


def _surface_entity(sf: _StepFile, s: BsplineSurface) -> int:
    nu, nv, _ = s.control.shape
    ids = _cartesian_points(sf, s.control.reshape(-1, 3))
    rows = []
    for i in range(nu):
        rows.append("(" + ",".join(f"#{ids[i * nv + j]}" for j in range(nv)) + ")")
    grid = "(" + ",".join(rows) + ")"
    ku, mu = knots_with_multiplicity(s.knots_u)
    kv, mv = knots_with_multiplicity(s.knots_v)
    return sf.add(
        "B_SPLINE_SURFACE_WITH_KNOTS('',{du},{dv},{grid},.UNSPECIFIED.,.F.,.F.,.F.,"
        "({mu}),({mv}),({ku}),({kv}),.UNSPECIFIED.)".format(
            du=s.degree_u,
            dv=s.degree_v,
            grid=grid,
            mu=",".join(str(int(m)) for m in mu),
            mv=",".join(str(int(m)) for m in mv),
            ku=",".join(_fmt(k) for k in ku),
            kv=",".join(_fmt(k) for k in kv),
        )
    )


def _curve_entity(sf: _StepFile, c: BsplineCurve) -> int:
    ids = _cartesian_points(sf, c.control)
    pts = "(" + ",".join(f"#{i}" for i in ids) + ")"
    k, m = knots_with_multiplicity(c.knots)
    return sf.add(
        "B_SPLINE_CURVE_WITH_KNOTS('',{d},{pts},.UNSPECIFIED.,.F.,.F.,"
        "({m}),({k}),.UNSPECIFIED.)".format(
            d=c.degree,
            pts=pts,
            m=",".join(str(int(x)) for x in m),
            k=",".join(_fmt(x) for x in k),
        )
    )


def write_step(
    path: str,
    surfaces: List[BsplineSurface],
    curves: List[BsplineCurve],
    name: str = "brepgen_solid",
) -> None:
    sf = _StepFile()

    # units / context
    unit = sf.add(
        "( LENGTH_UNIT() NAMED_UNIT(*) SI_UNIT(.MILLI.,.METRE.) )"
    )
    ang = sf.add("( NAMED_UNIT(*) PLANE_ANGLE_UNIT() SI_UNIT($,.RADIAN.) )")
    solid_ang = sf.add("( NAMED_UNIT(*) SI_UNIT($,.STERADIAN.) SOLID_ANGLE_UNIT() )")
    unc = sf.add(
        f"UNCERTAINTY_MEASURE_WITH_UNIT(LENGTH_MEASURE(1.E-6),#{unit},"
        "'distance_accuracy_value','')"
    )
    ctx = sf.add(
        "( GEOMETRIC_REPRESENTATION_CONTEXT(3) "
        f"GLOBAL_UNCERTAINTY_ASSIGNED_CONTEXT((#{unc})) "
        f"GLOBAL_UNIT_ASSIGNED_CONTEXT((#{unit},#{ang},#{solid_ang})) "
        "REPRESENTATION_CONTEXT('',' ') )"
    )

    geo_ids = [_surface_entity(sf, s) for s in surfaces]
    geo_ids += [_curve_entity(sf, c) for c in curves]
    gset = sf.add(
        "GEOMETRIC_SET('{n}',({ids}))".format(
            n=name, ids=",".join(f"#{i}" for i in geo_ids)
        )
    )
    sf.add(
        f"GEOMETRICALLY_BOUNDED_SURFACE_SHAPE_REPRESENTATION('{name}',(#{gset}),#{ctx})"
    )

    lines = [
        "ISO-10303-21;",
        "HEADER;",
        "FILE_DESCRIPTION(('BrepGen-TPU generated B-rep geometry'),'2;1');",
        f"FILE_NAME('{name}.step','',('brepgen_tpu'),(''),'brepgen_tpu','','');",
        "FILE_SCHEMA(('CONFIG_CONTROL_DESIGN'));",
        "ENDSEC;",
        "DATA;",
    ]
    for i, e in enumerate(sf.entities, start=1):
        lines.append(f"#{i}={e};")
    lines += ["ENDSEC;", "END-ISO-10303-21;"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
