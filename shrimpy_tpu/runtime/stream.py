"""Streaming reconstruction of an OME-Zarr store over a device mesh.

The TPU-native replacement for the reference's offline biahub/HPC
post-processing fan-out (reference ``docs/data_structure.md:63-66``:
positions distributed over SLURM jobs) and the DynaTrack worker's
read-compute-write loop (``worker.py:196-262``):

* the work plan enumerates independent (position, timepoint, channel)
  volumes — the embarrassingly parallel axis (SURVEY.md §2.9);
* tensorstore async reads prefetch the next batch while the current one
  computes (host-side double buffering; tensorstore's C++ thread pool
  does the blosc-zstd decode, the role acquire-zarr's native writer
  plays in the reference);
* batches are device_put with the mesh sharding and run through the
  fused jit step (:func:`shrimpy_tpu.parallel.build_reconstruct_step`);
* writes are async and only awaited one batch later;
* a JSON-lines progress journal makes runs resumable: completed items
  are skipped on restart (SURVEY.md §5.4 — scan the store for written
  chunks and continue).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from shrimpy_tpu.config.schemas import ReconstructSettings
from shrimpy_tpu.io import ngff
from shrimpy_tpu.ops.deconv import gaussian_psf
from shrimpy_tpu.ops.phase import compute_transfer_function
from shrimpy_tpu.parallel.pipeline import build_reconstruct_step, output_shape
from shrimpy_tpu.utils.timing import StageTimer

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class WorkItem:
    position: str
    t: int
    c: int

    @property
    def key(self) -> str:
        return f"{self.position}|{self.t}|{self.c}"


def plan_work(
    store: ngff.NgffStore, settings: ReconstructSettings
) -> list[WorkItem]:
    """Enumerate the independent volumes selected by ``settings``."""
    items: list[WorkItem] = []
    for pos_key, pos in store.positions().items():
        if settings.positions is not None and pos_key not in settings.positions:
            continue
        t_size, c_size = pos.shape[0], pos.shape[1]
        # Externally-written stores may label fewer channels than the
        # array's C extent; unlabeled channels fall back to their index.
        names = [
            pos.channel_names[i]
            if pos.channel_names and i < len(pos.channel_names)
            else str(i)
            for i in range(c_size)
        ]
        for t in range(t_size):
            if settings.time_indices is not None and t not in settings.time_indices:
                continue
            for c in range(c_size):
                if settings.channels is not None and names[c] not in settings.channels:
                    continue
                items.append(WorkItem(pos_key, t, c))
    return items


def _load_psf(settings: ReconstructSettings) -> np.ndarray | None:
    if settings.deconvolve is None:
        return None
    path = settings.deconvolve.psf_path
    if path is None:
        # Default synthetic PSF; real pipelines set psf_path to the
        # bead-measured PSF (shrimpy_tpu.psf, reference measure_psf.py).
        return gaussian_psf((9, 15, 15), (1.5, 2.5, 2.5))
    p = Path(path)
    if p.suffix == ".npy":
        return np.load(p).astype(np.float32)
    pos = ngff.open_ngff(p).position()
    return pos.volume(0, 0).astype(np.float32)


def _create_output_store(
    in_store: ngff.NgffStore,
    out_path: Path,
    settings: ReconstructSettings,
    out_zyx: tuple[int, int, int],
    out_voxel: tuple[float, float, float],
    items: list[WorkItem],
):
    """Mirror the input layout (FOV or HCS) for the reconstructed data."""
    dtype = settings.output_dtype
    positions_out: dict[str, ngff.NgffPosition] = {}
    by_pos: dict[str, list[WorkItem]] = {}
    for it in items:
        by_pos.setdefault(it.position, []).append(it)

    if in_store.is_plate:
        first = next(iter(in_store.positions().values()))
        names = first.channel_names
        out_store = ngff.create_hcs(
            out_path, channel_names=names, version=in_store.version
        )
        for pos_key in by_pos:
            positions_out[pos_key] = _create_plate_position(
                out_store, in_store.positions()[pos_key], pos_key,
                out_zyx, out_voxel, dtype,
            )
    else:
        in_pos = in_store.position()
        pos = ngff.create_fov(
            out_path,
            shape=(in_pos.shape[0], in_pos.shape[1], *out_zyx),
            dtype=dtype,
            channel_names=in_pos.channel_names,
            zyx_scale=out_voxel,
            version=in_store.version,
        )
        positions_out[ngff.DEFAULT_POSITION_KEY] = pos
    return positions_out


def _create_plate_position(
    out_store, in_pos, pos_key: str, out_zyx, out_voxel, dtype: str
):
    """One output plate position mirroring ``in_pos`` (shared by fresh
    store creation and the missing-position backfill, so the two paths
    can never diverge)."""
    row, col, fov = pos_key.split("/")
    pos = out_store.create_position(
        row, col, fov, channel_names=in_pos.channel_names, zyx_scale=out_voxel
    )
    pos.create_array(
        (in_pos.shape[0], in_pos.shape[1], *out_zyx), dtype=dtype
    )
    return pos


def _as_output_dtype(batch: np.ndarray, dtype: str) -> np.ndarray:
    if dtype == "uint16":
        # NaN survives np.clip and NaN->uint16 is undefined (platform-
        # dependent garbage); zero non-finite voxels explicitly.
        batch = np.nan_to_num(batch, nan=0.0, posinf=65535.0, neginf=0.0)
        return np.clip(batch, 0, 65535).astype(np.uint16)
    return batch.astype(np.float32)


class _Progress:
    """JSON-lines journal of completed work items (resume support).

    Lines with a ``failed`` field record contained per-item IO failures
    (:class:`shrimpy_tpu.config.schemas.IORetrySettings`); they do NOT
    count as done, so a ``resume=True`` run retries exactly the failed
    and missing items.
    """

    def __init__(self, path: Path):
        self.path = path
        self.done: set[str] = set()
        self.failed: list[dict] = []
        if path.exists():
            for line in path.read_text().splitlines():
                try:
                    rec = json.loads(line)
                    if not isinstance(rec, dict) or "failed" in rec:
                        continue
                    self.done.add(rec["key"])
                except (json.JSONDecodeError, KeyError):
                    continue

    def mark(self, items: list[WorkItem]) -> None:
        with open(self.path, "a") as f:
            for it in items:
                f.write(json.dumps({"key": it.key}) + "\n")
                self.done.add(it.key)

    def mark_failed(self, item: WorkItem, stage: str, error: str) -> None:
        rec = {"key": item.key, "failed": stage, "error": error}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self.failed.append(rec)

    @staticmethod
    def iter_done_keys(path: Path):
        """Yield (position, t, c) for every DONE record in a journal.

        The single source of truth for the journal line format shared
        with external consumers (the store-mode monitor): dict records
        only, lines with a ``failed`` field are NOT done, ``key`` is
        ``"pos|t|c"``.
        """
        try:
            text = Path(path).read_text()
        except OSError:
            return
        for line in text.splitlines():
            try:
                rec = json.loads(line)
                if not isinstance(rec, dict) or "failed" in rec:
                    continue
                pos_key, t, c = rec["key"].split("|")
                yield pos_key, int(t), int(c)
            except (json.JSONDecodeError, KeyError, ValueError):
                continue  # torn/corrupt line


def reconstruct_store(
    input_path: str | Path,
    output_path: str | Path,
    settings: ReconstructSettings,
    *,
    mesh=None,
    batch_size: int | None = None,
    resume: bool = False,
    timer: StageTimer | None = None,
) -> dict:
    """Reconstruct every selected volume of ``input_path`` into
    ``output_path``; returns a summary dict.

    ``batch_size`` defaults to the mesh device count (or 1). With
    ``resume=True``, previously completed items (per the progress
    journal sidecar) are skipped.
    """
    input_path, output_path = Path(input_path), Path(output_path)
    timer = timer or StageTimer()
    in_store = ngff.open_ngff(input_path)
    items = plan_work(in_store, settings)
    if not items:
        raise ValueError(f"no work selected in {input_path}")

    first_pos = in_store.positions()[items[0].position]
    raw_zyx = tuple(first_pos.shape[2:])
    raw_scale = first_pos.zyx_scale
    for it in items:
        shape = tuple(in_store.positions()[it.position].shape[2:])
        if shape != raw_zyx:
            # One compiled program per run: mixed extents need separate
            # runs (select positions via settings.positions).
            raise ValueError(
                f"position {it.position!r} has volume shape {shape} != "
                f"{raw_zyx}; reconstruct heterogeneous stores in "
                "per-shape runs using settings.positions"
            )

    out_zyx = output_shape(raw_zyx, settings)
    if settings.deskew is not None:
        from shrimpy_tpu.ops.deskew import get_deskewed_shape

        _, out_voxel = get_deskewed_shape(
            raw_zyx, settings.deskew, pixel_size_um=raw_scale[1]
        )
    else:
        out_voxel = raw_scale

    n_dev = mesh.devices.size if mesh is not None else 1
    batch_size = batch_size or n_dev
    if mesh is not None:
        # The batch axis shards over the mesh: round up to a multiple of
        # the mesh's batch dimension (short batches are zero-padded).
        batch_axis = mesh.devices.shape[0]
        from shrimpy_tpu.utils.shapes import round_up

        batch_size = round_up(batch_size, batch_axis)

    progress_path = output_path.with_suffix(output_path.suffix + ".progress.jsonl")
    if progress_path.exists() and (
        not resume
        # A journal without its output store is stale (the store was
        # deleted to start over but the sidecar was missed): trusting
        # it would skip 'done' items into a fresh store full of holes.
        or not output_path.exists()
    ):
        progress_path.unlink()
    progress = _Progress(progress_path)
    todo = [it for it in items if it.key not in progress.done]

    positions_out = None
    if not output_path.exists():
        positions_out = _create_output_store(
            in_store, output_path, settings, out_zyx, out_voxel, items
        )
    else:
        out_store = ngff.open_ngff(output_path)
        positions_out = {
            k: v
            for k, v in out_store.positions().items()
            if k in {it.position for it in items}
        }
        # The existing output must match THIS run's geometry/dtype:
        # otherwise (e.g. a rerun with deskew toggled or a different
        # PSF grid) every write fails, and with contain_failures the
        # run would journal all items failed yet exit 0 — a "success"
        # that wrote nothing.
        for pos_key, pos in positions_out.items():
            in_tc = tuple(in_store.positions()[pos_key].shape[:2])
            want = (*in_tc, *out_zyx)
            if tuple(pos.shape) != want or str(pos.dtype) != settings.output_dtype:
                raise ValueError(
                    f"existing output {output_path} position {pos_key} has "
                    f"shape {tuple(pos.shape)} dtype {pos.dtype}, but this "
                    f"run produces {want} {settings.output_dtype} — the "
                    "output was written with different settings or against "
                    "a store whose T/C extents have since changed; remove "
                    "it or point -o elsewhere"
                )
        # A broader selection (or a run that crashed during store
        # creation) can reference positions the existing output lacks:
        # create them now instead of KeyError-ing mid-run.
        missing = {it.position for it in items} - set(positions_out)
        if missing and out_store.is_plate:
            for pos_key in sorted(missing):
                positions_out[pos_key] = _create_plate_position(
                    out_store, in_store.positions()[pos_key], pos_key,
                    out_zyx, out_voxel, settings.output_dtype,
                )
        elif missing:
            raise ValueError(
                f"existing FOV output {output_path} lacks positions "
                f"{sorted(missing)}; remove it or reconcile the selection"
            )

    psf = _load_psf(settings)
    tf_arr = jnp.zeros((2, 1, 1, 1), jnp.float32)
    if settings.phase is not None:
        from shrimpy_tpu.ops.phase import tf_as_real
        from shrimpy_tpu.parallel.pipeline import _stage_input_shape_for_phase

        tfs = settings.phase.transfer_function
        ph_shape = _stage_input_shape_for_phase(raw_zyx, settings)
        tf_arr = jnp.asarray(
            tf_as_real(
                # compute_transfer_function pads by z_padding itself;
                # passing a pre-padded shape double-padded the TF and
                # broke every z_padding > 0 phase reconstruction.
                compute_transfer_function(ph_shape, tfs)
            )
        )

    step = build_reconstruct_step(settings, psf=psf, mesh=mesh, donate=False)
    sharding = (
        NamedSharding(mesh, P("batch", None, None, "space")) if mesh is not None else None
    )

    in_positions = in_store.positions()
    batches = [todo[i : i + batch_size] for i in range(0, len(todo), batch_size)]

    # Streaming-IO fault tolerance (reference robust_cmmcore.py:24-53):
    # every item read/write retries in place; persistent failures are
    # journaled failed-and-skipped instead of aborting the run.
    from shrimpy_tpu.utils.retry import robust_call

    retry_cfg = settings.io_retry

    def start_reads(batch: list[WorkItem]):
        # A synchronous failure at issue time does NOT consume a retry
        # attempt: the prefetch slot holds None and read_item re-issues
        # at resolve time with the full retry_cfg.attempts budget (so
        # an item can see at most attempts+1 tries end to end — the
        # budget bounds the resolve-time tries).
        futs = []
        for it in batch:
            try:
                futs.append(
                    in_positions[it.position].read_async((it.t, it.c))
                )
            except Exception as e:  # noqa: BLE001 — per-item containment
                logger.warning(
                    "read issue failed for %s: %s (will retry)", it.key, e
                )
                futs.append(None)
        return futs

    def read_item(it: WorkItem, fut) -> np.ndarray | None:
        """Resolve one prefetched read; retries re-issue the read.
        Returns None when the item persistently fails (contained)."""
        state = {"fut": fut}

        def once():
            # A spent/failed prefetch slot (or a None from an issue-time
            # failure) re-issues the read.
            f = state.pop("fut", None)
            if f is None:
                f = in_positions[it.position].read_async((it.t, it.c))
            return np.asarray(f.result(), dtype=np.float32)

        try:
            return robust_call(
                once, attempts=retry_cfg.attempts, wait_s=retry_cfg.wait_s
            )
        except Exception as e:  # noqa: BLE001 — containment policy
            if not retry_cfg.contain_failures:
                raise
            logger.error("read failed for %s after %d attempts: %s",
                         it.key, retry_cfg.attempts, e)
            progress.mark_failed(it, "read", str(e))
            return None

    # (items, write futures, host data) for the batch whose writes are
    # in flight. A batch is journaled as done ONLY after its own writes
    # resolve — marking at issue time would let a crash leave journaled-
    # but-never-committed holes that resume=True silently skips. The
    # host data is held so a failed write can retry synchronously.
    pending: tuple[list[WorkItem], list, np.ndarray] | None = None
    read_futures = start_reads(batches[0]) if batches else []
    n_done = 0
    inflight: tuple | None = None  # (batch, device output) awaiting D2H

    def flush_writes() -> None:
        """Await the in-flight batch's writes, then journal it."""
        nonlocal pending, n_done
        if pending is None:
            return
        batch_written, futs, data = pending
        committed: list[WorkItem] = []
        for it, fut, vol in zip(batch_written, futs, data):
            # First attempt awaits the in-flight async future; retries
            # re-issue the write synchronously (a failed future is spent).
            state = {"fut": fut}

            def once(it=it, vol=vol, state=state):
                f = state.pop("fut", None)
                if f is not None:
                    f.result()
                    return
                positions_out[it.position].write_async(
                    (it.t, it.c), vol
                ).result()

            try:
                robust_call(
                    once, attempts=retry_cfg.attempts, wait_s=retry_cfg.wait_s
                )
                committed.append(it)
            except Exception as e:  # noqa: BLE001 — containment policy
                if not retry_cfg.contain_failures:
                    raise
                logger.error("write failed for %s after %d attempts: %s",
                             it.key, retry_cfg.attempts, e)
                progress.mark_failed(it, "write", str(e))
        pending = None
        progress.mark(committed)
        n_done += len(committed)
        logger.info("reconstructed %d/%d volumes", n_done, len(todo))

    def retire(entry) -> None:
        """Materialize a finished batch's output and issue its writes."""
        nonlocal pending
        batch_done, out_dev = entry
        with timer.stage("d2h"):
            out_host = np.asarray(out_dev)[: len(batch_done)]
        with timer.stage("write"):
            flush_writes()
            out_cast = _as_output_dtype(out_host, settings.output_dtype)
            futs = []
            for it, vol in zip(batch_done, out_cast):
                try:
                    futs.append(
                        positions_out[it.position].write_async(
                            (it.t, it.c), vol
                        )
                    )
                except Exception as e:  # noqa: BLE001 — per-item containment
                    logger.warning(
                        "write issue failed for %s: %s (will retry)",
                        it.key, e,
                    )
                    futs.append(None)
            pending = (batch_done, futs, out_cast)

    for bi, batch in enumerate(batches):
        with timer.stage("read"):
            vols = [
                read_item(it, f) for it, f in zip(batch, read_futures)
            ]
            # Contained read failures drop their items from the batch.
            batch = [it for it, v in zip(batch, vols) if v is not None]
            vols = [v for v in vols if v is not None]
        # Prefetch the next batch while this one computes.
        if bi + 1 < len(batches):
            read_futures = start_reads(batches[bi + 1])
        if not batch:
            continue

        with timer.stage("h2d"):
            pad = batch_size - len(vols)
            stacked = np.stack(vols + [np.zeros(raw_zyx, np.float32)] * pad)
            device_batch = (
                jax.device_put(stacked, sharding)
                if sharding is not None
                else jnp.asarray(stacked)
            )
        with timer.stage("compute"):
            # Dispatch is async; the previous batch's D2H + writes
            # overlap this batch's device execution (double buffering).
            out = step(device_batch, tf_arr)
            try:
                out.copy_to_host_async()
            except AttributeError:  # backend without async host copy
                pass
        if inflight is not None:
            retire(inflight)
        inflight = (batch, out)

    if inflight is not None:
        retire(inflight)
    flush_writes()

    if settings.pyramid_levels > 0:
        # Over ALL output positions, not just this run's todo — a
        # resumed run (todo empty or partial) must still be able to add
        # levels a crashed run never wrote. Positions whose BASE data
        # changed this run re-pool even if levels exist (a resume that
        # retried a previously-failed item would otherwise leave stale
        # level data); add_pyramid_levels is idempotent.
        written = {it.position for it in todo if it.key in progress.done}
        with timer.stage("pyramid"):
            for pos_key in {it.position for it in items}:
                pos = positions_out[pos_key]
                unleveled = (
                    len(pos.attrs["multiscales"][0]["datasets"]) == 1
                )
                if unleveled or pos_key in written:
                    ngff.add_pyramid_levels(pos, settings.pyramid_levels)

    summary = {
        "input": str(input_path),
        "output": str(output_path),
        "volumes": n_done,
        "skipped_resume": len(items) - len(todo),
        # Contained per-item IO failures (not marked done; resume=True
        # retries them).
        "failed": progress.failed,
        "raw_shape": raw_zyx,
        "out_shape": out_zyx,
        "out_voxel_um": tuple(float(v) for v in out_voxel),
        "stages": timer.as_dict(),
    }
    (output_path / "reconstruct_summary.json").parent.mkdir(
        parents=True, exist_ok=True
    )
    with open(output_path / "reconstruct_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return summary
