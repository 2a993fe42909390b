"""Table and model processing pipelines.

TableProcessor / TabOp* and ModelProcessor / ModOp* analogues (reference
Common/TableProcessor.h, Moco/Moco/ModelOperators.h:29-335): small
composable operations applied before a tool consumes a table or model.
Python callables compose with `|` like the reference's operator chains.
"""

from __future__ import annotations

import copy
from typing import Callable

import numpy as np

from .tables import StoTable


def filter_lowpass(table: StoTable, cutoff_hz: float,
                   order: int = 4) -> StoTable:
    """Zero-phase Butterworth low-pass (reference filterLowpass,
    MocoUtilities.h:244 uses a 4th-order Butterworth via filtfilt)."""
    from scipy.signal import butter, filtfilt

    dt = np.mean(np.diff(table.time))
    wn = min(0.999, 2.0 * cutoff_hz * dt)
    b, a = butter(order, wn)
    data = filtfilt(b, a, table.data, axis=0)
    return StoTable(table.time, table.column_names, data, table.metadata)


def convert_degrees_to_radians(table: StoTable) -> StoTable:
    """inDegrees=yes tables -> radians (reference convertTableToStorage +
    Model::getSimbodyEngine().convertDegreesToRadians)."""
    if not table.in_degrees():
        return table
    meta = dict(table.metadata)
    meta["inDegrees"] = "no"
    return StoTable(table.time, table.column_names,
                    np.deg2rad(table.data), meta)


def resample_table(table: StoTable, new_time) -> StoTable:
    new_time = np.asarray(new_time)
    data = np.stack([np.interp(new_time, table.time, table.data[:, j])
                     for j in range(table.data.shape[1])], axis=1)
    return StoTable(new_time, table.column_names, data, table.metadata)


class TableProcessor:
    """table | op | op ... (reference Common/TableProcessor.h)."""

    def __init__(self, table_or_path):
        if isinstance(table_or_path, str):
            from .tables import read_sto
            self.table = read_sto(table_or_path)
        else:
            self.table = table_or_path
        self.ops: list[Callable] = []

    def __or__(self, op: Callable) -> "TableProcessor":
        out = TableProcessor(self.table)
        out.ops = self.ops + [op]
        return out

    def process(self) -> StoTable:
        t = self.table
        for op in self.ops:
            t = op(t)
        return t


def TabOpLowPassFilter(cutoff_hz):
    return lambda t: filter_lowpass(t, cutoff_hz)


def TabOpConvertDegreesToRadians():
    return convert_degrees_to_radians


# ---- model operators (subset; grows with the component library) ---------

def ModOpAddReserves(optimal_force=1.0, bound=None):
    """Add a reserve CoordinateActuator to every coordinate
    (reference ModOpAddReserves, ModelOperators.h:310;
    ModelFactory::createReserveActuators)."""

    def op(model):
        for i, cname in enumerate(model.mech.coord_names):
            lo = -np.inf if bound is None else -bound
            hi = np.inf if bound is None else bound
            model.add_coordinate_actuator(f"reserve_{cname}", i,
                                          optimal_force=optimal_force,
                                          min_control=lo, max_control=hi)
        return model

    return op


def ModOpIgnoreActivationDynamics():
    def op(model):
        model.muscles = [
            type(m)(m.name, m.path, True, m.ignore_tendon_compliance,
                    m.tendon_dynamics_implicit, m.ignore_passive_fiber_force)
            for m in model.muscles]
        return model

    return op


def ModOpIgnoreTendonCompliance():
    def op(model):
        model.muscles = [
            type(m)(m.name, m.path, m.ignore_activation_dynamics, True,
                    m.tendon_dynamics_implicit, m.ignore_passive_fiber_force)
            for m in model.muscles]
        return model

    return op


def ModOpIgnorePassiveFiberForcesDGF():
    def op(model):
        model.muscles = [
            type(m)(m.name, m.path, m.ignore_activation_dynamics,
                    m.ignore_tendon_compliance, m.tendon_dynamics_implicit,
                    True)
            for m in model.muscles]
        return model

    return op


def ModOpTendonComplianceDynamicsModeDGF(mode="implicit"):
    def op(model):
        model.muscles = [
            type(m)(m.name, m.path, m.ignore_activation_dynamics,
                    m.ignore_tendon_compliance, mode == "implicit",
                    m.ignore_passive_fiber_force)
            for m in model.muscles]
        return model

    return op


def ModOpScaleMaxIsometricForce(factor):
    def op(model):
        for mp in model._muscle_params:
            mp["max_isometric_force"] = mp["max_isometric_force"] * factor
        return model

    return op


class ModelProcessor:
    """model | op | op ... (reference ModelProcessor.h:47-159)."""

    def __init__(self, model):
        self.model = model
        self.ops: list[Callable] = []

    def __or__(self, op: Callable) -> "ModelProcessor":
        out = ModelProcessor(self.model)
        out.ops = self.ops + [op]
        return out

    def process(self):
        m = self.model
        for op in self.ops:
            m = op(m)
        return m
