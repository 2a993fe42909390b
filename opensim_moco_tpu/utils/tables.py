"""OpenSim STO/MOT storage-file I/O.

Reads/writes the tab-separated storage format used by the reference for
trajectories, solutions, and input data (golden files like
std_testMocoInverse_subject_18musc_solution.sto carry MocoSolution header
metadata; reference MocoTrajectory.h:736-738 documents the embedded
success/objective header keys).

This is the Python implementation; a faster C++ parser with the same
interface lives in opensim_moco_tpu/native (built optionally).
"""

from __future__ import annotations

import io
from typing import Sequence

import numpy as np


def _read_sto_native(path):
    """C++ fast path; returns None if the native library is unavailable or
    the file does not parse cleanly."""
    import ctypes

    from ..native import get_tableio

    lib = get_tableio()
    if lib is None:
        return None
    h = lib.tableio_parse(str(path).encode())
    try:
        err = lib.tableio_error(h).decode()
        if err:
            return None
        nrows = lib.tableio_nrows(h)
        ncols = lib.tableio_ncols(h)
        data = np.empty((nrows, ncols), dtype=np.float64)
        if nrows:
            lib.tableio_copy_data(
                h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        names = [lib.tableio_column_name(h, i).decode()
                 for i in range(ncols)]
        meta = {}
        for i in range(lib.tableio_nmeta(h)):
            k = lib.tableio_meta_key(h, i).decode()
            meta.setdefault(k, lib.tableio_meta_value(h, i).decode())
        return StoTable(data[:, 0] if nrows else np.zeros(0), names[1:],
                        data[:, 1:] if nrows else np.zeros((0, ncols - 1)),
                        meta)
    finally:
        lib.tableio_free(h)


class StoTable:
    """Column table with string metadata (TimeSeriesTable analogue)."""

    def __init__(self, time, column_names, data, metadata=None):
        self.time = np.asarray(time, dtype=np.float64)
        self.column_names = list(column_names)
        self.data = np.asarray(data, dtype=np.float64)
        self.metadata = dict(metadata or {})
        assert self.data.shape == (len(self.time), len(self.column_names))

    def column(self, name):
        return self.data[:, self.column_names.index(name)]

    def in_degrees(self):
        return self.metadata.get("inDegrees", "no").strip().lower() == "yes"


def read_sto(path_or_buf) -> StoTable:
    """Parse a .sto/.mot file (header keys until 'endheader', then a
    tab/space separated table whose first column is time).

    Uses the native C++ parser (opensim_moco_tpu/native/tableio.cpp) when
    available; falls back to pure Python."""
    if isinstance(path_or_buf, (str, bytes)):
        native = _read_sto_native(path_or_buf)
        if native is not None:
            return native
        with open(path_or_buf, "r") as fh:
            text = fh.read()
    else:
        text = path_or_buf.read()
    lines = text.splitlines()
    meta = {}
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if line == "endheader":
            break
        if "=" in line:
            k, _, v = line.partition("=")
            meta[k.strip()] = v.strip()
        elif line:
            meta.setdefault("name", line)
    # column header line
    while i < len(lines) and not lines[i].strip():
        i += 1
    names = lines[i].split()
    i += 1
    rows = []
    for line in lines[i:]:
        line = line.strip()
        if not line:
            continue
        rows.append([float(x) for x in line.split()])
    arr = np.asarray(rows, dtype=np.float64)
    if arr.size == 0:
        arr = np.zeros((0, len(names)))
    time = arr[:, 0]
    return StoTable(time, names[1:], arr[:, 1:], meta)


def write_sto(path, table: StoTable, name="table") -> None:
    with open(path, "w") as fh:
        fh.write(f"{table.metadata.get('name', name)}\n")
        for k, v in table.metadata.items():
            if k == "name":
                continue
            fh.write(f"{k}={v}\n")
        if "version" not in table.metadata:
            fh.write("version=3\n")
        fh.write(f"nRows={len(table.time)}\n")
        fh.write(f"nColumns={1 + len(table.column_names)}\n")
        fh.write("endheader\n")
        fh.write("time\t" + "\t".join(table.column_names) + "\n")
        for i, t in enumerate(table.time):
            row = "\t".join(f"{float(x):.17g}" for x in table.data[i])
            fh.write(f"{float(t):.17g}\t{row}\n")


def trajectory_to_sto(traj, path):
    """Write a Trajectory/Solution in the reference's solution layout
    (states, controls, multipliers, derivatives columns + solution stats
    in the header, cf. MocoTrajectory::write)."""
    cols = []
    names = []
    for group_names, data in [
            (traj.state_names, traj.states),
            (traj.control_names, traj.controls),
            (traj.multiplier_names, traj.multipliers),
            (traj.derivative_names, traj.derivatives)]:
        if data is None or not len(group_names):
            continue
        names += list(group_names)
        data = np.asarray(data)
        if group_names is traj.multiplier_names:
            # Moco multiplier convention: the reference applies constraint
            # forces from -lambda (MocoCasOCProblem.h:646-667) while our
            # residual uses +G^T lambda; negate on write (and on read in
            # sto_to_trajectory) so .sto files interop with golden
            # solutions and our own round-trips stay consistent
            data = -data
        cols.append(data)
    data = np.concatenate(cols, axis=1) if cols else np.zeros(
        (len(traj.time), 0))
    meta = {"name": "MocoSolution", "DataType": "double",
            "inDegrees": "no",
            "num_states": str(len(traj.state_names)),
            "num_controls": str(len(traj.control_names)),
            "num_multipliers": str(len(traj.multiplier_names)),
            "num_derivatives": str(len(traj.derivative_names)),
            "num_parameters": str(len(traj.parameter_names))}
    success = getattr(traj, "success", None)
    if success is not None:
        meta["success"] = "true" if success else "false"
        meta["objective"] = f"{float(getattr(traj, 'objective', float('nan'))):.17g}"
        meta["num_iterations"] = str(getattr(traj, "num_iterations", -1))
        meta["solver_duration"] = \
            f"{float(getattr(traj, 'solver_duration', float('nan'))):.17g}"
        meta["status"] = str(getattr(traj, "status", ""))
    write_sto(path, StoTable(traj.time, names, data, meta))


def sto_to_trajectory(path):
    """Load a reference/our .sto solution into a Trajectory (state/control
    columns recognized by their path structure)."""
    from .trajectory import Solution, Trajectory

    t = read_sto(path)
    state_names, controls_names, mult_names, deriv_names = [], [], [], []
    for n in t.column_names:
        if (n.endswith("/value") or n.endswith("/speed") or
                n.endswith("/activation") or
                n.endswith("/normalized_tendon_force")):
            state_names.append(n)
        elif n.startswith("lambda") or "/multiplier" in n:
            mult_names.append(n)
        elif (n.endswith("/accel") or "implicitderiv" in n or
              n.endswith("_derivative")):
            deriv_names.append(n)
        else:
            controls_names.append(n)
    pick = lambda ns: (np.stack([t.column(n) for n in ns], axis=1)
                       if ns else np.zeros((len(t.time), 0)))
    meta = t.metadata
    # Moco lambda convention is opposite ours; see trajectory_to_sto
    return Solution(
        time=t.time,
        state_names=state_names, states=pick(state_names),
        control_names=controls_names, controls=pick(controls_names),
        multiplier_names=mult_names, multipliers=-pick(mult_names),
        derivative_names=deriv_names, derivatives=pick(deriv_names),
        success=meta.get("success", "true") == "true",
        objective=float(meta.get("objective", "nan")),
        status=meta.get("status", ""),
    )


class TrcTable:
    """Marker-trajectory table read from a .trc motion-capture file
    (the format consumed by the reference's MocoTrack marker path,
    MocoTrack.cpp:235-270 via TRCFileAdapter). Positions are stored in
    meters regardless of the file's Units header."""

    def __init__(self, time, marker_names, positions, metadata=None):
        self.time = np.asarray(time, dtype=np.float64)
        self.marker_names = list(marker_names)
        # (K, M, 3), meters; missing samples are NaN
        self.positions = np.asarray(positions, dtype=np.float64)
        self.metadata = dict(metadata or {})

    def marker(self, name):
        return self.positions[:, self.marker_names.index(name)]


def read_trc(path) -> TrcTable:
    """Parse a TRC marker file (reference TRCFileAdapter format: 3 header
    lines, a marker-name row, an X1/Y1/Z1 component row, then frames of
    ``Frame# Time x y z ...``). Units are converted to meters (``mm`` is
    the common capture convention, as in
    Moco/Examples/C++/example3DWalking/marker_trajectories.trc)."""
    with open(path) as f:
        lines = [ln.rstrip("\r\n") for ln in f]
    if len(lines) < 6:
        raise ValueError(f"{path}: truncated TRC file")
    # writers pad the value row with extra tabs; align non-empty cells
    hdr_keys = [c.strip() for c in lines[1].split("\t") if c.strip()]
    hdr_vals = [c.strip() for c in lines[2].split("\t") if c.strip()]
    meta = dict(zip(hdr_keys, hdr_vals))
    units = meta.get("Units", "m").lower()
    scale = {"mm": 1e-3, "cm": 1e-2, "m": 1.0}.get(units, 1.0)
    name_row = lines[3].split("\t")
    # marker names sit every 3 columns starting after Frame#, Time
    names = [c.strip() for c in name_row[2:] if c.strip()]
    rows = []
    for ln in lines[5:]:
        if not ln.strip():
            continue
        cells = ln.split("\t")
        vals = [float(c) if c.strip() else np.nan for c in cells[1:]]
        rows.append(vals)
    M = len(names)
    K = len(rows)
    time = np.array([r[0] for r in rows])
    pos = np.full((K, M, 3), np.nan)
    for k, r in enumerate(rows):
        dat = r[1:1 + 3 * M]
        dat = dat + [np.nan] * (3 * M - len(dat))
        pos[k] = np.asarray(dat).reshape(M, 3)
    return TrcTable(time, names, pos * scale, meta)
