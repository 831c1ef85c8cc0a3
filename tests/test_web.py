"""Browser surface for the monitor (viewer/web.py).

The reference's graphical viewer is a napari process
(reference ``shrimpy/viewer/_napari_process.py``); ours is an HTTP
page over the monitor's control files. These tests drive the server
with urllib — no browser needed — and check that the controls land in
exactly the files the headless monitor reads.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from shrimpy_tpu.viewer.web import MonitorWebServer


@pytest.fixture()
def server(tmp_path):
    srv = MonitorWebServer(tmp_path, port=0).start()
    yield srv, tmp_path
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(srv.url.rstrip("/") + path, timeout=5) as r:
        return r.status, r.read()


def _post(srv, path, body):
    req = urllib.request.Request(
        srv.url.rstrip("/") + path, data=json.dumps(body).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, json.loads(r.read())


def test_page_and_empty_state(server):
    srv, _ = server
    status, body = _get(srv, "/")
    assert status == 200
    assert b"shrimpy-tpu" in body and b"re-stretch" in body
    status, body = _get(srv, "/state")
    assert status == 200 and json.loads(body) == {}


def test_state_passthrough(server):
    srv, root = server
    (root / "state.json").write_text(json.dumps({"follow": True, "evicted": 2}))
    _, body = _get(srv, "/state")
    assert json.loads(body)["evicted"] == 2


def test_images_listing_and_fetch(server):
    srv, root = server
    png = b"\x89PNG\r\n\x1a\nfakebody"
    (root / "live_p0_GFP.png").write_bytes(png)
    _, body = _get(srv, "/images")
    listing = json.loads(body)
    assert [e["name"] for e in listing] == ["live_p0_GFP.png"]
    assert listing[0]["mtime"] > 0
    _, body = _get(srv, "/img/live_p0_GFP.png")
    assert body == png


def test_img_rejects_traversal_and_non_png(server):
    srv, root = server
    (root / "state.json").write_text("{}")
    for bad in ["/img/../state.json", "/img/state.json", "/img/a%2f..%2fb.png"]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(srv, bad)
        assert e.value.code == 404


def test_post_view_writes_control_file(server):
    srv, root = server
    status, resp = _post(srv, "/view", {"follow": False, "t": 3})
    assert status == 200 and resp == {"ok": True}
    assert json.loads((root / "view.json").read_text()) == {
        "follow": False, "t": 3,
    }
    # The contrast-refresh knob rides the same file.
    _post(srv, "/view", {"follow": True, "contrast": "refresh"})
    assert json.loads((root / "view.json").read_text())["contrast"] == "refresh"


def test_post_deskew_writes_geometry(server):
    srv, root = server
    _post(srv, "/deskew", {"ls_angle_deg": 32.0, "px_to_scan_ratio": 0.4})
    geo = json.loads((root / "deskew.json").read_text())
    assert geo == {"ls_angle_deg": 32.0, "px_to_scan_ratio": 0.4}


def test_post_rejects_bad_bodies(server):
    srv, _ = server
    req = urllib.request.Request(
        srv.url.rstrip("/") + "/view", data=b"not json", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=5)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/view", ["not", "an", "object"])
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/nope", {})
    assert e.value.code == 404


def test_controls_reach_live_monitor(server, tmp_path):
    """A browser POST must land where LiveMonitor.refresh_controls looks."""
    import numpy as np

    from shrimpy_tpu.viewer.live import LiveMonitor
    from shrimpy_tpu.viewer.ring import FrameRing

    srv, root = server
    ring = FrameRing(None, n_slots=4, frame_shape=(8, 8))
    try:
        mon = LiveMonitor(ring, root)
        _post(srv, "/view", {"follow": False, "t": 1})
        assert mon.refresh_controls() is True
        assert mon.follow is False and mon.pinned_t == 1
        _post(srv, "/deskew", {"ls_angle_deg": 31.0, "px_to_scan_ratio": 0.39})
        assert mon.refresh_controls() is True
        assert mon.deskew is not None
        assert np.isclose(mon.deskew.ls_angle_deg, 31.0)
    finally:
        ring.close()


def test_meta_reports_live_mode(tmp_path):
    srv = MonitorWebServer(tmp_path, port=0, live=False).start()
    try:
        _, body = _get(srv, "/meta")
        assert json.loads(body) == {
            "live": False, "run_control": False, "plan": False,
        }
    finally:
        srv.stop()
    srv2 = MonitorWebServer(tmp_path, port=0).start()
    try:
        _, body = _get(srv2, "/meta")
        assert json.loads(body) == {
            "live": True, "run_control": False, "plan": False,
        }
    finally:
        srv2.stop()


def test_concurrent_posts_never_publish_torn_controls(server):
    """ThreadingHTTPServer handles POSTs concurrently; hammering one
    control file must always leave valid JSON on disk (round-3 review
    finding: a shared fixed tmp name could publish truncated files)."""
    import threading

    srv, root = server
    errors = []

    def hammer(i):
        try:
            for k in range(25):
                _post(srv, "/view", {"follow": bool(k % 2), "t": i * 100 + k})
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    view = json.loads((root / "view.json").read_text())  # must parse
    assert set(view) == {"follow", "t"}
    # No orphaned tmp files left behind.
    assert not list(root.glob("view.json.*.tmp"))


def test_run_control_endpoint(tmp_path):
    """POST /run drives a running acquisition's run_control.json
    (engine/control.py protocol); without one attached it's a 409 and
    the page's meta reports it."""
    target = tmp_path / "out" / "run_control.json"
    target.parent.mkdir()
    srv = MonitorWebServer(tmp_path, port=0, run_control=target).start()
    try:
        _, meta = _post(srv, "/view", {})  # warm-up, any POST works
        status, body = _get(srv, "/meta")
        assert json.loads(body)["run_control"] is True
        status, body = _post(srv, "/run", {"command": "pause"})
        assert status == 200 and body == {"ok": True}
        assert json.loads(target.read_text()) == {"command": "pause"}
        status, body = _post(srv, "/run", {"command": "abort"})
        assert json.loads(target.read_text()) == {"command": "abort"}
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/run", {"command": "explode"})
        assert e.value.code == 400
    finally:
        srv.stop()


def test_run_control_absent_is_409(server):
    srv, _ = server
    status, body = _get(srv, "/meta")
    assert json.loads(body)["run_control"] is False
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/run", {"command": "pause"})
    assert e.value.code == 409


def test_plan_editor_round_trip(tmp_path):
    """Browser plan editor (reference mantis_acquisition_widget.py:
    604-657, 685-788): GET the attached YAML, validate a candidate,
    save only when the `plan validate` checks pass."""
    plan = tmp_path / "plan.yml"
    plan.write_text("time: {n_timepoints: 2}\n")
    srv = MonitorWebServer(tmp_path, port=0, plan_path=plan).start()
    try:
        _, body = _get(srv, "/meta")
        assert json.loads(body)["plan"] is True
        _, body = _get(srv, "/plan")
        loaded = json.loads(body)
        assert loaded["path"] == str(plan)
        assert "n_timepoints: 2" in loaded["text"]

        # Valid edit: validate then save; the file updates atomically.
        good = "time: {n_timepoints: 5}\n"
        status, v = _post(srv, "/plan/validate", {"text": good})
        assert v == {"valid": True, "problems": []}
        status, s = _post(srv, "/plan/save", {"text": good})
        assert s["saved"] is True
        assert plan.read_text() == good

        # Invalid edit (unknown key): validation reports, save refuses
        # and leaves the file untouched.
        bad = "time: {n_timepoints: 5}\nbogus_key: 1\n"
        status, v = _post(srv, "/plan/validate", {"text": bad})
        assert v["valid"] is False and v["problems"]
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/plan/save", {"text": bad})
        assert e.value.code == 422
        assert plan.read_text() == good

        # Semantic problem the engine would fail on (sequenced-event
        # cap), not just schema: same checks as `plan validate`.
        over = (
            "channels: [{name: a, exposure_ms: 5}, {name: b, exposure_ms: 5}]\n"
            "z: {n_slices: 601}\n"
            "camera: {model_acquisition: true, mode: labelfree}\n"
        )
        _, v = _post(srv, "/plan/validate", {"text": over})
        assert v["valid"] is False
        assert any("sequenced events" in p for p in v["problems"])
    finally:
        srv.stop()


def test_plan_editor_store_cross_check(tmp_path):
    """With plan_store attached, edits are validated against the store
    (channel names, z depth) — the `plan validate --input` tier."""
    from shrimpy_tpu.io.synthetic import coordinate_encoded_fov

    coordinate_encoded_fov(tmp_path / "src.zarr", shape=(1, 1, 3, 8, 8))
    plan = tmp_path / "plan.yml"
    plan.write_text("{}\n")
    srv = MonitorWebServer(
        tmp_path, port=0, plan_path=plan,
        plan_store=tmp_path / "src.zarr",
    ).start()
    try:
        _, v = _post(
            srv, "/plan/validate",
            {"text": "channels: [{name: nope, exposure_ms: 5}]\n"},
        )
        assert v["valid"] is False
        assert any("'nope' not in store" in p for p in v["problems"])
        _, v = _post(srv, "/plan/validate", {"text": "{}\n"})
        assert v["valid"] is True
    finally:
        srv.stop()


def test_plan_endpoints_absent_without_plan(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, "/plan")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/plan/save", {"text": "{}"})
    assert e.value.code == 409
