"""Viewer ring + feeder: torn-slot detection, budget sizing, row gather."""

import numpy as np
import pytest

from shrimpy_tpu.viewer.ring import FrameRing


@pytest.fixture()
def ring():
    r = FrameRing(None, n_slots=4, frame_shape=(8, 16))
    yield r
    r.close()


def test_ring_write_read_roundtrip(ring):
    frame = np.arange(128, dtype=np.float32).reshape(8, 16)
    slot = ring.write(0, frame)
    seq, out = ring.read(slot)
    assert seq == 0
    np.testing.assert_array_equal(out, frame)


def test_ring_overwrites_oldest(ring):
    for seq in range(6):  # 6 frames into 4 slots
        ring.write(seq, np.full((8, 16), seq, np.float32))
    seq, latest = ring.latest()
    assert seq == 5
    assert latest[0, 0] == 5
    # Slot 0 now holds seq 4 (overwritten).
    assert ring.read(0)[0] == 4


def test_ring_read_rows_gather(ring):
    for seq in range(4):
        ring.write(seq, np.full((8, 16), seq, np.float32))
    rows = ring.read_rows(3, [0, 1, 2, 3])
    assert rows.shape == (4, 16)
    np.testing.assert_array_equal(rows[:, 0], [0, 1, 2, 3])


def test_slots_for_budget():
    # 1 MB budget, 8x16 float32 frames (512 B) -> 2048 slots.
    assert FrameRing.slots_for_budget(1.0, (8, 16)) == 2048
    # Tiny budget clamps to the 2-slot minimum.
    assert FrameRing.slots_for_budget(0.0001, (2048, 2048)) == 2


def test_cross_handle_visibility():
    """A reader attached by name sees the writer's frames (the
    cross-process contract, exercised in-process)."""
    writer = FrameRing(None, n_slots=2, frame_shape=(4, 4))
    try:
        reader = FrameRing(
            writer.name, n_slots=2, frame_shape=(4, 4), create=False
        )
        writer.write(7, np.full((4, 4), 3.5, np.float32))
        seq, frame = reader.latest()
        assert seq == 7
        assert frame[0, 0] == 3.5
        reader.close()
    finally:
        writer.close()


def test_feeder_never_raises_without_start():
    from shrimpy_tpu.viewer.feeder import ViewerFeeder

    feeder = ViewerFeeder(frame_shape=(8, 16))
    # Hook before start() silently no-ops (never-raise contract).
    feeder.on_volume(np.zeros((2, 8, 16), np.float32), 0, "0", "BF")
    assert feeder.dropped == 0


def test_feeder_ring_floor_grows_to_hold_one_volume():
    """A ring smaller than one volume self-evicts (writing nz planes laps
    the volume's own head), so ``n_z`` raises the slot count to nz+1
    regardless of the MB budget."""
    from shrimpy_tpu.viewer.feeder import ViewerFeeder

    # 0.001 MB holds only 2 frames of (8, 16) f32; n_z=10 needs 11.
    feeder = ViewerFeeder(frame_shape=(8, 16), cache_mb=0.001, n_z=10)
    assert feeder.n_slots == 11
    # A budget already above the floor is respected unchanged.
    roomy = ViewerFeeder(frame_shape=(8, 16), cache_mb=1.0, n_z=10)
    assert roomy.n_slots == FrameRing.slots_for_budget(1.0, (8, 16))


def test_feeder_skips_oversize_volumes_instead_of_lapping():
    """Without n_z, a volume taller than the ring is dropped (counted)
    rather than written: publishing it would overwrite its own head
    slots and the monitor's seq check would reject it anyway."""
    from shrimpy_tpu.viewer.feeder import ViewerFeeder

    feeder = ViewerFeeder(frame_shape=(4, 4), cache_mb=0.0001)  # 2 slots
    feeder.ring = FrameRing(None, n_slots=feeder.n_slots, frame_shape=(4, 4))
    ctx_queue = __import__("multiprocessing").get_context("spawn").Queue(4)
    feeder._queue = ctx_queue
    try:
        feeder.on_volume(np.zeros((5, 4, 4), np.float32), 0, "0", "BF")
        assert feeder.dropped == 1
        assert feeder._seq == 0  # nothing written to the ring
        # A fitting volume still publishes normally afterwards.
        feeder.on_volume(np.zeros((2, 4, 4), np.float32), 0, "0", "BF")
        assert feeder._seq == 2
    finally:
        feeder.ring.close()
        ctx_queue.cancel_join_thread()


def test_volume_index_tail_rereads_torn_line(tmp_path):
    """A partially-appended volumes.jsonl line must be delivered WHOLE
    once completed, not split across polls (each fragment unparseable)."""
    import json as _json

    from shrimpy_tpu.viewer.live import VolumeIndexTail

    path = tmp_path / "volumes.jsonl"
    tail = VolumeIndexTail(path)
    full = _json.dumps({"t": 0, "p": "0", "channel": "BF"}) + "\n"
    torn = _json.dumps({"t": 1, "p": "0", "channel": "BF"}) + "\n"
    with open(path, "w") as f:
        f.write(full + torn[:10])  # feeder mid-append on line 2
    msgs = tail.poll()
    assert [m["t"] for m in msgs] == [0]
    with open(path, "a") as f:
        f.write(torn[10:])  # append completes
    msgs = tail.poll()
    assert [m["t"] for m in msgs] == [1]


def test_deskew_preview_matches_volume_deskew(rng):
    """The row-gather preview equals the corresponding lab z-plane of a
    full volume deskew (up to the interpolation convention)."""
    import math

    from shrimpy_tpu.config import DeskewSettings
    from shrimpy_tpu.io.synthetic import render_beads_skewed
    from shrimpy_tpu.ops.deskew import deskew_volume
    from shrimpy_tpu.viewer.deskew_preview import deskew_preview_plane

    settings = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.386, keep_overhang=True
    )
    beads = np.array([[5.0, 40.0, 12.0], [8.0, 70.0, 20.0]])
    raw = render_beads_skewed((64, 32, 32), beads)

    t_row = 10  # lab z = 10 * sin(30 deg) = 5.0
    preview = deskew_preview_plane(raw[:, t_row, :], settings)

    full = np.asarray(deskew_volume(raw, settings))
    z_lab = int(round(t_row * math.sin(math.radians(30.0))))
    # The preview's y axis is offset by t*cos(theta) lab pixels.
    y_off = t_row * math.cos(math.radians(30.0))
    n = min(preview.shape[0], full.shape[1] - int(np.ceil(y_off)) - 1)
    ref_plane = full[z_lab, int(round(y_off)) : int(round(y_off)) + n, :]
    corr = np.corrcoef(preview[:n].ravel(), ref_plane.ravel())[0, 1]
    assert corr > 0.95, corr


def test_preview_from_ring(rng):
    from shrimpy_tpu.config import DeskewSettings
    from shrimpy_tpu.viewer.deskew_preview import preview_from_ring

    ring = FrameRing(None, n_slots=8, frame_shape=(16, 32))
    try:
        for s in range(8):
            ring.write(s, rng.random((16, 32), dtype=np.float32))
        settings = DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.5)
        plane = preview_from_ring(ring, list(range(8)), tilt_row=4, settings=settings)
        assert plane.shape == (15, 32)  # floor(7/0.5)+1
        assert np.isfinite(plane).all()
    finally:
        ring.close()


# -- live monitor (reference _napari_process.py behaviors, headless) ---------


def _push_volume(ring, monitor, seq0, t, channel="BF", p="0", value=None,
                 nz=4, shape=(8, 16)):
    """Write one volume into the ring and index it in the monitor."""
    slots = []
    for z in range(nz):
        frame = np.full(shape, value if value is not None else t * 10 + z,
                        np.float32)
        slots.append(ring.write(seq0 + z, frame))
    monitor.on_volume({"type": "volume", "t": t, "p": p, "channel": channel,
                       "slots": slots, "seq0": seq0, "shape": (nz, *shape)})
    return seq0 + nz


@pytest.fixture()
def live(tmp_path):
    from shrimpy_tpu.viewer.live import LiveMonitor

    ring = FrameRing(None, n_slots=16, frame_shape=(8, 16))
    monitor = LiveMonitor(ring, tmp_path / "preview")
    yield ring, monitor, tmp_path / "preview"
    ring.close()


def test_live_follow_latest_then_scrub_pause(live):
    """Follow-latest auto-advance; view.json scrub pins a timepoint;
    follow=true resumes (reference _napari_process.py:293-329)."""
    import json as _json

    ring, monitor, out = live
    seq = _push_volume(ring, monitor, 0, t=0)
    seq = _push_volume(ring, monitor, seq, t=1)
    monitor.render_dirty()
    state = _json.loads((out / "state.json").read_text())
    assert state["displayed"]["0|BF"] == 1  # follow-latest

    (out / "view.json").write_text('{"follow": false, "t": 0}')
    assert monitor.refresh_controls()
    monitor.render_dirty()
    state = _json.loads((out / "state.json").read_text())
    assert state["displayed"]["0|BF"] == 0  # scrub-paused at t=0

    # New volumes keep arriving but the display stays pinned.
    seq = _push_volume(ring, monitor, seq, t=2)
    monitor.render_dirty()
    state = _json.loads((out / "state.json").read_text())
    assert state["displayed"]["0|BF"] == 0

    (out / "view.json").write_text('{"follow": true}')
    assert monitor.refresh_controls()
    monitor.render_dirty()
    state = _json.loads((out / "state.json").read_text())
    assert state["displayed"]["0|BF"] == 2  # Home-resume


def test_live_z_scrub_renders_requested_plane(live):
    """view.json {"z": k} scrubs the rendered z plane (clamped); null
    restores the mid-plane (napari z slider, _napari_process.py:293-329)."""
    import json as _json

    ring, monitor, out = live
    _push_volume(ring, monitor, 0, t=0, nz=4)
    monitor.render_dirty()
    png = next(out.glob("live_*.png"))
    mid_bytes = png.read_bytes()
    state = _json.loads((out / "state.json").read_text())
    assert state["pinned_z"] is None
    assert monitor._plane_index(4) == 2  # mid-plane default

    (out / "view.json").write_text('{"z": 0}')
    assert monitor.refresh_controls()
    monitor.render_dirty()
    state = _json.loads((out / "state.json").read_text())
    assert state["pinned_z"] == 0
    assert monitor._plane_index(4) == 0
    # Planes differ (value = t*10 + z), so the PNG must change.
    assert png.read_bytes() != mid_bytes

    # Out-of-range scrub clamps like napari's slider.
    (out / "view.json").write_text('{"z": 99}')
    assert monitor.refresh_controls()
    assert monitor._plane_index(4) == 3

    # null restores the mid-plane.
    (out / "view.json").write_text('{"z": null}')
    assert monitor.refresh_controls()
    assert monitor._plane_index(4) == 2


def test_live_editable_deskew_geometry(live):
    """Editing deskew.json re-renders the side view with the new
    geometry without new frames (reference DeskewControls,
    _napari_process.py:202-291)."""
    import json as _json

    ring, monitor, out = live
    _push_volume(ring, monitor, 0, t=0)
    monitor.render_dirty()
    png = out / "live_p0_BF.png"
    assert png.exists()

    (out / "deskew.json").write_text(
        '{"ls_angle_deg": 30.0, "px_to_scan_ratio": 0.5}'
    )
    assert monitor.refresh_controls()
    assert monitor.render_dirty() == 1  # re-rendered with no new volume
    state = _json.loads((out / "state.json").read_text())
    assert state["deskew"]["px_to_scan_ratio"] == 0.5

    # Geometry edit: angle change triggers another re-render.
    (out / "deskew.json").write_text(
        '{"ls_angle_deg": 45.0, "px_to_scan_ratio": 0.5}'
    )
    assert monitor.refresh_controls()
    assert monitor.render_dirty() == 1
    state = _json.loads((out / "state.json").read_text())
    assert state["deskew"]["ls_angle_deg"] == 45.0


def test_live_per_channel_autocontrast_frozen(live):
    """Contrast limits are computed per channel on first render and
    stay fixed so brightness is comparable across time
    (reference _napari_process.py:416-433)."""
    ring, monitor, out = live
    seq = _push_volume(ring, monitor, 0, t=0, channel="BF", value=10.0)
    seq = _push_volume(ring, monitor, seq, t=0, channel="GFP", value=1000.0)
    monitor.render_dirty()
    bf0 = monitor.contrast["BF"]
    gfp0 = monitor.contrast["GFP"]
    assert bf0[1] < gfp0[1]  # per-channel, not global
    seq = _push_volume(ring, monitor, seq, t=1, channel="BF", value=9000.0)
    monitor.render_dirty()
    assert monitor.contrast["BF"] == bf0  # frozen


def test_live_contrast_refresh_control(live):
    """Writing {"contrast": "refresh"} to view.json drops the frozen
    limits so the next render re-stretches (PARITY.md divergence knob
    for the reference's per-update auto-contrast)."""
    import json as _json

    ring, monitor, out = live
    seq = _push_volume(ring, monitor, 0, t=0, channel="BF", value=10.0)
    monitor.render_dirty()
    bf0 = monitor.contrast["BF"]
    seq = _push_volume(ring, monitor, seq, t=1, channel="BF", value=9000.0)
    (out / "view.json").write_text(_json.dumps({"contrast": "refresh"}))
    assert monitor.refresh_controls()
    assert "BF" not in monitor.contrast
    monitor.render_dirty()
    assert monitor.contrast["BF"][1] > bf0[1]  # re-stretched to t=1


def test_live_contrast_mode_auto(live):
    """{"contrast_mode": "auto"} re-stretches every render (the
    reference's per-update auto-contrast, _napari_process.py:416-433);
    switching back to "freeze" re-freezes at the next render."""
    import json as _json

    ring, monitor, out = live
    seq = _push_volume(ring, monitor, 0, t=0, channel="BF", value=10.0)
    monitor.render_dirty()
    bf0 = monitor.contrast["BF"]
    (out / "view.json").write_text(_json.dumps({"contrast_mode": "auto"}))
    assert monitor.refresh_controls()
    seq = _push_volume(ring, monitor, seq, t=1, channel="BF", value=9000.0)
    monitor.render_dirty()
    assert monitor.contrast["BF"][1] > bf0[1]  # re-stretched to t=1
    bf1 = monitor.contrast["BF"]
    (out / "view.json").write_text(_json.dumps({"contrast_mode": "freeze"}))
    assert monitor.refresh_controls()
    seq = _push_volume(ring, monitor, seq, t=2, channel="BF", value=10.0)
    monitor.render_dirty()
    frozen = monitor.contrast["BF"]
    _push_volume(ring, monitor, seq, t=3, channel="BF", value=5000.0)
    monitor.render_dirty()
    assert monitor.contrast["BF"] == frozen  # frozen again
    assert frozen[1] < bf1[1]


def test_live_volume_granularity_eviction(live):
    """A volume lapped by the ring is never rendered half-overwritten:
    the monitor falls back to the newest still-resident volume
    (reference _napari_process.py:358-385)."""
    import json as _json

    ring, monitor, out = live
    seq = _push_volume(ring, monitor, 0, t=0)
    seq = _push_volume(ring, monitor, seq, t=1)
    monitor.render_dirty()
    # Lap the ring: 16 slots, overwrite t=1's slots (seq 4..7) with
    # newer frames, then ask for t=1.
    seq = _push_volume(ring, monitor, 16, t=2)  # slots 0..3 overwritten
    seq = _push_volume(ring, monitor, 20, t=3)  # slots 4..7 overwritten
    (out / "view.json").write_text('{"follow": false, "t": 1}')
    monitor.refresh_controls()
    monitor.render_dirty()
    state = _json.loads((out / "state.json").read_text())
    # t=1 is evicted; the monitor fell back to a resident volume.
    assert state["evicted"] >= 1
    assert state["displayed"]["0|BF"] in (2, 3)


def test_feeder_writes_attach_surface(tmp_path):
    """ViewerFeeder publishes ring.json + volumes.jsonl so an external
    monitor can attach (the file-based queue replacement)."""
    import json as _json

    from shrimpy_tpu.viewer.feeder import ViewerFeeder
    from shrimpy_tpu.viewer.live import attach

    feeder = ViewerFeeder(frame_shape=(8, 16), cache_mb=0.01,
                          preview_dir=tmp_path / "preview")
    # Avoid the subprocess on the 1-CPU test box: set up the ring and
    # descriptor without spawning the monitor.
    feeder.preview_dir.mkdir(parents=True, exist_ok=True)
    feeder.ring = FrameRing(None, n_slots=feeder.n_slots,
                            frame_shape=feeder.frame_shape)
    (feeder.preview_dir / "ring.json").write_text(_json.dumps({
        "ring": feeder.ring.name, "n_slots": feeder.n_slots,
        "frame_shape": list(feeder.frame_shape), "dtype": "float32"}))
    import queue as _q
    feeder._queue = _q.Queue(maxsize=4)
    try:
        feeder.on_volume(np.ones((3, 8, 16), np.float32), 0, "0", "BF")
        feeder.on_volume(np.full((3, 8, 16), 2, np.float32), 1, "0", "BF")
        ring, tail = attach(tmp_path / "preview")
        msgs = tail.poll()
        assert [m["t"] for m in msgs] == [0, 1]
        assert msgs[0]["seq0"] == 0 and msgs[1]["seq0"] == 3
        seq, frame = ring.read(msgs[1]["slots"][0])
        assert seq == 3 and frame[0, 0] == 2
        assert tail.poll() == []  # tail is incremental
        ring.close()
    finally:
        feeder.ring.close()


def test_colormap_for_channel_mapping():
    """Channel-name substring -> colormap, first match wins, default
    gray (reference _napari_process.py:447-460)."""
    from shrimpy_tpu.viewer.live import colormap_for_channel

    assert colormap_for_channel("BF") == "gray"
    for name, expect in [
        ("GFP", "shrimpy_green"),
        ("epi-FITC", "shrimpy_green"),
        ("mCherry", "shrimpy_magenta"),
        ("Rhodamine-B", "shrimpy_magenta"),
        ("DAPI", "shrimpy_blue"),
    ]:
        cmap = colormap_for_channel(name)
        assert cmap != "gray" and cmap.name == expect, name
        # Black at 0 -> saturated color at 1.
        assert cmap(0.0)[:3] == (0.0, 0.0, 0.0)
        assert max(cmap(1.0)[:3]) == 1.0 or name.startswith("DAPI")


def test_live_axis_scrub_slices_y_and_x(live):
    """view.json {"axis": "y"/"x", "z": k} slices the requested axis —
    napari scrubs every axis of the (p, t, z, y, x) array (reference
    _napari_process.py:293-329); bad axis values are ignored."""
    import json as _json

    ring, monitor, out = live
    _push_volume(ring, monitor, 0, t=0, nz=4)
    monitor.render_dirty()
    png = next(out.glob("live_*.png"))
    z_bytes = png.read_bytes()

    (out / "view.json").write_text('{"axis": "y", "z": 3}')
    assert monitor.refresh_controls()
    monitor.render_dirty()
    state = _json.loads((out / "state.json").read_text())
    assert state["slice_axis"] == "y"
    y_bytes = png.read_bytes()
    assert y_bytes != z_bytes  # a (Z, X) plane, not a (Y, X) plane

    (out / "view.json").write_text('{"axis": "x", "z": 1}')
    assert monitor.refresh_controls()
    monitor.render_dirty()
    assert png.read_bytes() != y_bytes

    (out / "view.json").write_text('{"axis": "diag"}')
    assert not monitor.refresh_controls()  # ignored, state unchanged
    assert monitor.slice_axis == "x"


def test_live_channel_visibility_toggle(live):
    """view.json {"channels": [...]} hides other channels' layers and
    removes their PNGs (napari's per-layer visibility toggles); null
    restores all."""
    import json as _json

    ring, monitor, out = live
    seq = _push_volume(ring, monitor, 0, t=0, channel="BF")
    _push_volume(ring, monitor, seq, t=0, channel="GFP")
    monitor.render_dirty()
    pngs = sorted(p.name for p in out.glob("live_*.png"))
    assert len(pngs) == 2
    state = _json.loads((out / "state.json").read_text())
    assert state["channels"] == ["BF", "GFP"]

    (out / "view.json").write_text('{"channels": ["GFP"]}')
    assert monitor.refresh_controls()
    monitor.render_dirty()
    pngs = sorted(p.name for p in out.glob("live_*.png"))
    assert len(pngs) == 1 and "GFP" in pngs[0]
    state = _json.loads((out / "state.json").read_text())
    assert state["visible_channels"] == ["GFP"]
    assert "0|BF" not in state["displayed"]

    (out / "view.json").write_text('{"channels": null}')
    assert monitor.refresh_controls()
    monitor.render_dirty()
    assert len(list(out.glob("live_*.png"))) == 2
