"""Web resolver tests: the browser front end's JSON API end-to-end
(the reference's GUI resolution flow, gui_slint/mod.rs:75-186, served
over stdlib http.server)."""

import json
import os
import urllib.request

import pytest

from vid_dup_finder_lib_tpu.match_group import MatchGroup


def _mkfiles(tmp_path, names):
    tmp_path.mkdir(parents=True, exist_ok=True)
    paths = []
    for i, n in enumerate(names):
        p = tmp_path / n
        p.write_bytes(b"x" + bytes([i]))
        paths.append(str(p))
    return paths


@pytest.fixture()
def server(tmp_path):
    from vid_dup_finder_lib_tpu.app.resolver_web import start_resolver_web

    a = _mkfiles(tmp_path / "a", ["v0.mp4", "v1.mp4", "v2.mp4"])
    b = _mkfiles(tmp_path / "b", ["w0.mp4", "w1.mp4"])
    os.makedirs(tmp_path / "trash")
    groups = [MatchGroup.new(a), MatchGroup.new(b)]
    srv, app = start_resolver_web(
        groups, trash_dir=str(tmp_path / "trash"), port=0
    )
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, app, a, b, tmp_path
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read(), r.headers.get("Content-Type", "")


def _post(url, obj):
    req = urllib.request.Request(
        url,
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_page_and_state(server):
    base, app, a, b, _ = server
    status, body, ctype = _get(base + "/")
    assert status == 200 and ctype.startswith("text/html")
    assert b"keep-expression" in body

    status, body, _ = _get(base + "/api/state?g=0")
    st = json.loads(body)
    assert status == 200
    assert st["n_groups"] == 2
    assert [e["path"] for e in st["entries"]] == sorted(a)
    assert all(not e["trashed"] and e["exists"] for e in st["entries"])
    assert st["entries"][0]["size_mb"] is not None

    # out-of-range group index clamps instead of erroring
    st2 = json.loads(_get(base + "/api/state?g=99")[1])
    assert st2["group"] == 1


def test_resolve_and_untrash_via_api(server):
    base, app, a, b, tmp_path = server
    status, res = _post(base + "/api/resolve", {"g": 0, "expr": "1"})
    assert status == 200 and res["ok"]
    assert os.path.exists(a[1])
    assert not os.path.exists(a[0]) and not os.path.exists(a[2])
    assert len(os.listdir(tmp_path / "trash")) == 2

    st = json.loads(_get(base + "/api/state?g=0")[1])
    trashed = [e["path"] for e in st["entries"] if e["trashed"]]
    assert sorted(trashed) == sorted([a[0], a[2]])
    assert any("trashed" in line for line in st["log"])

    # untrash entry 0 back
    status, res = _post(base + "/api/resolve", {"g": 0, "expr": "u0"})
    assert status == 200 and res["ok"]
    assert os.path.exists(a[0])

    # group 2 untouched
    assert all(os.path.exists(p) for p in b)


def test_bad_expression_and_bad_routes(server):
    base, app, a, b, _ = server
    status, res = _post(base + "/api/resolve", {"g": 0, "expr": "bogus!"})
    assert status == 400 and not res["ok"]
    assert all(os.path.exists(p) for p in a)  # nothing happened

    status, res = _post(base + "/api/resolve", {"g": 99, "expr": "0"})
    assert status == 400

    status, _, _ = _get(base + "/api/state")
    assert status == 200
    try:
        _get(base + "/nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def _post_raw(url, headers, data):
    req = urllib.request.Request(
        url, data=data, headers=headers, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_cross_origin_and_negative_indices_rejected(server):
    """Mutating endpoints move/delete files: forged cross-origin posts
    (hostile Origin, or no-cors text/plain) and negative indices must be
    refused without touching anything."""
    base, app, a, b, _ = server
    body = json.dumps({"g": 0, "expr": "0"}).encode()

    assert _post_raw(
        base + "/api/resolve",
        {"Content-Type": "application/json",
         "Origin": "http://evil.example"},
        body,
    ) == 403
    assert _post_raw(
        base + "/api/resolve", {"Content-Type": "text/plain"}, body
    ) == 403
    # same-origin Origin (what the served page itself sends) is allowed
    host = base[len("http://"):]
    assert _post_raw(
        base + "/api/open",
        {"Content-Type": "application/json", "Origin": f"http://{host}"},
        json.dumps({"g": 0, "e": 0}).encode(),
    ) == 200

    status, _res = _post(base + "/api/resolve", {"g": -1, "expr": "0"})
    assert status == 400
    try:
        _get(base + "/thumb?g=-1&e=0")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
    assert all(os.path.exists(p) for p in a + b)  # nothing was trashed


def test_thumb_endpoint_serves_jpeg_for_real_video(server, tmp_path):
    """Point a thunk at a real decodable fixture video: /thumb must
    return an image/jpeg strip; non-videos 404 as undecodable."""
    from tests.fixtures import make_fixture_videos

    base, app, a, b, _ = server
    vids = make_fixture_videos(
        os.path.join(os.path.dirname(__file__), "data")
    )
    # swap a real video into group 0's thunk (index-addressed serving)
    app.thunks[0].entries[0] = str(vids[0])
    status, body, ctype = _get(base + "/thumb?g=0&e=0")
    assert status == 200 and ctype == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # JPEG SOI

    # the 1-byte fake "video" is undecodable -> 404
    try:
        _get(base + "/thumb?g=0&e=1")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404

    # out-of-range entry
    try:
        _get(base + "/thumb?g=0&e=99")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
