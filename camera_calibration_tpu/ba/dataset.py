"""Calibration dataset structures: features, imagesets, observation tables.

Host-side containers mirror the reference's Dataset model (reference:
applications/camera_calibration/src/camera_calibration/dataset.h:57-128):
a ``Dataset`` holds per-camera image sizes, a list of imagesets (one time
instant across the rig, with per-camera feature lists), and the known
pattern geometries mapping feature id -> 2D position on the board.

For the device, everything is flattened into a padded, static-shape
``ObservationTable`` (SoA: imageset/camera/point indices + pixel), the
TPU-native equivalent of the reference's SoA upload for the CUDA BA
(cuda_joint_optimization.cuh:43).  Validity masks replace dynamic sizes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PointFeature:
    """One detected feature (reference: dataset.h:57)."""

    xy: np.ndarray  # (2,) pixel-corner convention
    feature_id: int


@dataclasses.dataclass
class Imageset:
    """Features of all cameras at one instant (reference: dataset.h:88)."""

    features: list[list[PointFeature]]  # [camera][feature]
    filenames: list[str] | None = None


@dataclasses.dataclass
class KnownGeometry:
    """Pattern sheet geometry (reference: dataset.h:49)."""

    cell_length_in_meters: float
    feature_id_to_position: dict[int, tuple[float, float]]


@dataclasses.dataclass
class Dataset:
    """Full calibration dataset (reference: dataset.h:128)."""

    num_cameras: int
    image_sizes: list[tuple[int, int]]  # (width, height) per camera
    imagesets: list[Imageset] = dataclasses.field(default_factory=list)
    known_geometries: list[KnownGeometry] = dataclasses.field(default_factory=list)

    def feature_id_count(self) -> int:
        m = -1
        for g in self.known_geometries:
            if g.feature_id_to_position:
                m = max(m, max(g.feature_id_to_position.keys()))
        for s in self.imagesets:
            for feats in s.features:
                for f in feats:
                    m = max(m, f.feature_id)
        return m + 1

    def merge(self, other: "Dataset") -> None:
        """Merge another dataset into this one for joint calibration.

        Each merged recording's pattern sheets are treated as *new* known
        geometries: the other dataset's feature IDs are offset past this
        dataset's current maximum so corners from physically distinct
        pattern printouts never alias, and its imagesets are appended
        (reference: dataset.cc:77-126 Dataset::Merge).

        Raises ValueError on camera-count or image-size mismatch (the
        reference returns false for both).
        """
        if self.num_cameras != other.num_cameras:
            raise ValueError(
                f"cannot merge datasets with {self.num_cameras} vs "
                f"{other.num_cameras} cameras"
            )
        for ci in range(self.num_cameras):
            if tuple(self.image_sizes[ci]) != tuple(other.image_sizes[ci]):
                raise ValueError(
                    f"camera {ci} image size mismatch: "
                    f"{self.image_sizes[ci]} vs {other.image_sizes[ci]}"
                )
        offset = self.feature_id_count()
        for g in other.known_geometries:
            self.known_geometries.append(
                KnownGeometry(
                    cell_length_in_meters=g.cell_length_in_meters,
                    feature_id_to_position={
                        fid + offset: pos
                        for fid, pos in g.feature_id_to_position.items()
                    },
                )
            )
        for s in other.imagesets:
            self.imagesets.append(
                Imageset(
                    features=[
                        [
                            PointFeature(
                                xy=np.asarray(f.xy), feature_id=f.feature_id + offset
                            )
                            for f in feats
                        ]
                        for feats in s.features
                    ],
                    filenames=list(s.filenames) if s.filenames else None,
                )
            )


def _obs_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    meta = [f for f in fields if f == "grid_shape"]
    data = [f for f in fields if f != "grid_shape"]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)
    return cls


@_obs_dataclass
class ObservationTable:
    """Padded SoA observation table for device-side BA.

    When ``grid_shape=(M, P)`` is set the table is in *grid layout*: row
    ``m * P + p`` holds the observation of point ``p`` in imageset ``m``
    (invalid where unobserved).  In this layout every imageset/point
    segment reduction is a reshape + axis sum and every state gather is a
    broadcast — no one-hot indicators, no gathers — which is the
    TPU-native shape of a calibration problem (dense board visibility).
    See ``to_grid_layout``.
    """

    imageset: jnp.ndarray  # (N,) int32
    camera: jnp.ndarray  # (N,) int32
    point: jnp.ndarray  # (N,) int32 — index into the points array
    pixel: jnp.ndarray  # (N, 2)
    valid: jnp.ndarray  # (N,) bool
    grid_shape: tuple | None = None  # static (M, P) when in grid layout

    @property
    def count(self):
        return self.pixel.shape[0]


def split_by_camera(obs: ObservationTable, segments) -> tuple:
    """Split a camera-sorted table into per-camera tables (static slices).

    The per-camera tuple is the pytree handed to the jitted BA step — each
    leaf can then be sharded over a device mesh along the observation axis.
    """
    out = []
    for s, c in segments:
        out.append(
            ObservationTable(
                imageset=obs.imageset[s : s + c],
                camera=obs.camera[s : s + c],
                point=obs.point[s : s + c],
                pixel=obs.pixel[s : s + c],
                valid=obs.valid[s : s + c],
            )
        )
    return tuple(out)


def pad_table(obs: ObservationTable, multiple: int) -> ObservationTable:
    """Pad a table's observation axis to a multiple (invalid rows).

    Index columns are padded with their last entry (not 0) so that a
    pose-major sorted table stays sorted after padding — padded rows are
    masked invalid and contribute zeros regardless.
    """
    n = obs.count
    cap = ((n + multiple - 1) // multiple) * multiple
    if cap == n:
        return obs
    pad = cap - n

    def pad_arr(a, fill=0):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    def pad_idx(a):
        fill = a[-1] if a.shape[0] else jnp.zeros((), a.dtype)
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])

    return ObservationTable(
        imageset=pad_idx(obs.imageset),
        camera=pad_idx(obs.camera),
        point=pad_idx(obs.point),
        pixel=pad_arr(obs.pixel),
        valid=pad_arr(obs.valid, False),
    )


def to_grid_layout(
    obs: ObservationTable, n_imagesets: int, n_points: int
) -> ObservationTable:
    """Re-lay a (single-camera) table into dense (M, P) grid layout.

    Row ``m * P + p`` of the result is the observation of point ``p`` in
    imageset ``m`` (valid=False where unobserved).  Host-side one-time
    transform; at most one observation per (imageset, point) pair is
    assumed (true by construction: a board point appears once per image).
    """
    m, p = int(n_imagesets), int(n_points)
    ims = np.asarray(obs.imageset)
    pts = np.asarray(obs.point)
    valid = np.asarray(obs.valid)
    slot = (ims * p + pts)[valid]
    pix_dtype = np.asarray(obs.pixel).dtype
    pixel = np.zeros((m * p, 2), pix_dtype)
    pixel[slot] = np.asarray(obs.pixel)[valid]
    vout = np.zeros(m * p, bool)
    vout[slot] = True
    cam0 = int(np.asarray(obs.camera)[0]) if obs.count else 0
    return ObservationTable(
        imageset=jnp.asarray(np.repeat(np.arange(m, dtype=np.int32), p)),
        camera=jnp.full((m * p,), cam0, jnp.int32),
        point=jnp.asarray(np.tile(np.arange(p, dtype=np.int32), m)),
        pixel=jnp.asarray(pixel),
        valid=jnp.asarray(vout),
        grid_shape=(m, p),
    )


def build_per_camera_tables(
    dataset: Dataset,
    feature_id_to_point_index: dict[int, int],
    *,
    image_used=None,
    dtype=jnp.float64,
) -> tuple:
    """One ObservationTable per camera from a Dataset.

    ``image_used``: optional per-imageset bool mask; imagesets beyond its
    length count as used (new images appended after a resume).  Shared by
    the fresh-calibration state builder and the --state_directory resume
    path (reference: ba_state.cc ComputeFeatureIdToPointsIndex + the
    per-camera observation gather in calibration.cc).
    """
    tables = []
    for ci in range(dataset.num_cameras):
        ims, ptids, pixels = [], [], []
        for i, s in enumerate(dataset.imagesets):
            if image_used is not None and i < len(image_used) \
                    and not image_used[i]:
                continue
            for f in s.features[ci]:
                if f.feature_id in feature_id_to_point_index:
                    ims.append(i)
                    ptids.append(feature_id_to_point_index[f.feature_id])
                    pixels.append(np.asarray(f.xy, np.float64))
        n = len(ims)
        tables.append(
            ObservationTable(
                imageset=jnp.asarray(np.array(ims, np.int32)),
                camera=jnp.full(n, ci, jnp.int32),
                point=jnp.asarray(np.array(ptids, np.int32)),
                pixel=jnp.asarray(
                    np.stack(pixels) if n else np.zeros((0, 2)), dtype
                ),
                valid=jnp.ones(n, bool),
            )
        )
    return tuple(tables)


def build_observation_table(
    dataset: Dataset,
    feature_id_to_point_index: dict[int, int],
    *,
    pad_to: int | None = None,
    dtype=jnp.float64,
) -> ObservationTable:
    """Flatten a Dataset into a padded ObservationTable.

    feature_id_to_point_index: compacting map (reference:
    ba_state.cc ComputeFeatureIdToPointsIndex).
    """
    ims, cams, pts, pix = [], [], [], []
    for si, s in enumerate(dataset.imagesets):
        for ci, feats in enumerate(s.features):
            for f in feats:
                if f.feature_id in feature_id_to_point_index:
                    ims.append(si)
                    cams.append(ci)
                    pts.append(feature_id_to_point_index[f.feature_id])
                    pix.append(np.asarray(f.xy, np.float64))
    n = len(ims)
    cap = pad_to or max(1, n)
    assert n <= cap, f"pad_to={cap} < observation count {n}"

    def pad_i(a):
        out = np.zeros(cap, np.int32)
        out[:n] = a
        return jnp.asarray(out)

    pixel = np.zeros((cap, 2), np.float64)
    if n:
        pixel[:n] = np.stack(pix)
    valid = np.zeros(cap, bool)
    valid[:n] = True
    return ObservationTable(
        imageset=pad_i(ims),
        camera=pad_i(cams),
        point=pad_i(pts),
        pixel=jnp.asarray(pixel, dtype),
        valid=jnp.asarray(valid),
    )
