"""ModelFactory: canned test models.

Mirrors reference Moco/Moco/Components/ModelFactory.h:39-90
(createNLinkPendulum, createPlanarPointMass, createSlidingPointMass,
createReserveActuators)."""

from __future__ import annotations

import numpy as np

from .mech import MechModelBuilder
from .model import Model


def create_sliding_point_mass(mass=1.0):
    """1-DOF point mass on a frictionless slider with one actuator
    (ModelFactory::createSlidingPointMass, ModelFactory.h:50)."""
    b = MechModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body("body", mass=mass, joint_name="slider", kind="prismatic",
               axis=(1, 0, 0), coord_name="position")
    model = Model(b.finalize())
    model.add_coordinate_actuator("actuator", "position", optimal_force=1.0)
    return model.finalize()


def create_planar_point_mass(mass=1.0, gravity=(0, -9.80665, 0)):
    """2-DOF planar point mass with x/y force actuators
    (ModelFactory::createPlanarPointMass, ModelFactory.h:56)."""
    b = MechModelBuilder(gravity=gravity)
    b.add_body("ptx", mass=0.0, joint_name="tx", kind="prismatic",
               axis=(1, 0, 0), coord_name="tx")
    b.add_body("body", mass=mass, parent="ptx", joint_name="ty",
               kind="prismatic", axis=(0, 1, 0), coord_name="ty")
    model = Model(b.finalize())
    model.add_coordinate_actuator("force_x", "tx", optimal_force=1.0)
    model.add_coordinate_actuator("force_y", "ty", optimal_force=1.0)
    return model.finalize()


def create_n_link_pendulum(num_links=1, link_mass=1.0, link_length=1.0,
                           gravity=(0, -9.80665, 0), with_actuators=True):
    """N-link planar pendulum with torque actuators at every joint
    (ModelFactory::createNLinkPendulum, ModelFactory.h:39; the reference
    uses links b0, b1, ... with coordinates q0, q1, ...)."""
    b = MechModelBuilder(gravity=gravity)
    for i in range(num_links):
        b.add_body(f"b{i}", mass=link_mass, com=(0, -link_length / 2, 0),
                   inertia=np.diag([0, 0, link_mass * link_length ** 2 / 12]),
                   parent="ground" if i == 0 else f"b{i-1}",
                   joint_name=f"j{i}", kind="revolute", axis=(0, 0, 1),
                   tree_r=(0, 0, 0) if i == 0 else (0, -link_length, 0),
                   coord_name=f"q{i}")
    model = Model(b.finalize())
    if with_actuators:
        for i in range(num_links):
            model.add_coordinate_actuator(f"tau{i}", f"q{i}",
                                          optimal_force=1.0)
    return model.finalize()


def create_reserve_actuators(model, optimal_force=1.0, bound=None,
                             skip_coordinates=()):
    """Add reserve actuators to every coordinate
    (ModelFactory::createReserveActuators, ModelFactory.h:90)."""
    for i, cname in enumerate(model.mech.coord_names):
        if cname in skip_coordinates:
            continue
        lo = -np.inf if bound is None else -bound
        hi = np.inf if bound is None else bound
        model.add_coordinate_actuator(f"reserve_{cname}", i,
                                      optimal_force=optimal_force,
                                      min_control=lo, max_control=hi)
    return model
