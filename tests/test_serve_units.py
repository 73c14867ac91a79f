import numpy as np

from mmrp_tpu.serve.app import (
    _parse_multipart,
    _png_base64,
    render_results,
    token_attention_html,
)


def test_png_base64_roundtrip(rng):
    g = rng.random((16, 16))
    b64 = _png_base64(g)
    assert isinstance(b64, str) and len(b64) > 100
    b64o = _png_base64(g, overlay=rng.random((16, 16)))
    assert isinstance(b64o, str)


def test_token_attention_html_escapes():
    html = token_attention_html(["<script>", "heart"], [0.9, 0.1])
    assert "<script>" not in html
    assert "&lt;script&gt;" in html
    assert "rgba(255,80,80,0.90)" in html


def test_multipart_parser():
    boundary = "XBOUND"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="text_query"\r\n\r\n'
        "hello world\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="dicom_file"; filename="a.dcm"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n"
        "BINARYDATA\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    fields = _parse_multipart(body, f"multipart/form-data; boundary={boundary}")
    assert fields["text_query"] == b"hello world"
    assert fields["dicom_file"] == b"BINARYDATA"


def test_multipart_parser_binary_safe_and_quoted_boundary():
    """Binary payloads ending in CR/LF/'-' bytes must arrive intact (the
    old rstrip(b'\\r\\n-') truncated ~1.2%-per-trailing-byte of DICOM
    uploads), and RFC 2046 quoted boundaries / trailing Content-Type
    params must parse."""
    boundary = "XBOUND"
    payload = b"PIXELDATA\x0a\x0d\x2d\x2d\x0a"  # ends in LF CR - - LF
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="dicom_file"; filename="a.dcm"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n".encode().decode()
    ).encode() + payload + (
        f"\r\n--{boundary}--\r\n"
    ).encode()
    for ctype in (
        f'multipart/form-data; boundary="{boundary}"',
        f"multipart/form-data; boundary={boundary}; charset=utf-8",
        f"multipart/form-data; boundary={boundary}",
    ):
        fields = _parse_multipart(body, ctype)
        assert fields["dicom_file"] == payload, ctype


def test_render_results_sections():
    payload = {
        "top_labels": [("cardiac", 0.9)],
        "retrieval": [("id1", 0.8)],
        "images": {"attention": "QUJD"},
        "token_html": "<span>x</span>",
        "agreement": {"attn_vs_ig": {"pearson": 0.5, "spearman": 0.4,
                                     "iou@5%": 0.1, "iou@20%": 0.2}},
        "latency_ms": 12.0,
        "retrieval_detail": [
            {"id": "id1", "score": 0.8, "overlay": "QUJD",
             "cross_map": {"pearson": 0.3, "iou@20%": 0.1}}
        ],
        "retrieval_diversity": 0.4,
    }
    html = render_results(payload)
    for frag in ("cardiac", "Similar cases", "Retrieved case detail",
                 "diversity", "12.0 ms"):
        assert frag in html
    assert render_results({}) == ""


def test_http_error_paths():
    """400/413 on malformed bodies — the server must not 500 or crash on
    garbage uploads (reference got this free from Flask)."""
    import json
    import urllib.error
    import urllib.request

    from mmrp_tpu.serve.app import serve

    # minimal ctx: error paths reject before any model touch
    server = serve(lambda: {}, port=0, block=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def post(path, data, headers):
        req = urllib.request.Request(base + path, data=data, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    try:
        # empty body
        assert post("/api/predict", b"", {"Content-Type": "application/json"}) == 400
        # malformed json
        assert post("/api/predict", b"{nope", {"Content-Type": "application/json"}) == 400
        # valid json, missing required field
        assert post("/api/predict", json.dumps({"text": "x"}).encode(),
                    {"Content-Type": "application/json"}) == 400
        # invalid base64
        assert post("/api/predict", json.dumps({"dicom_b64": "!!!"}).encode(),
                    {"Content-Type": "application/json"}) == 400
        # form POST that is not multipart
        assert post("/", b"text_query=x", {"Content-Type": "application/x-www-form-urlencoded"}) == 400
        # multipart missing the dicom file
        body = (b"--BB\r\nContent-Disposition: form-data; name=\"text_query\"\r\n\r\n"
                b"hello\r\n--BB--\r\n")
        assert post("/", body, {"Content-Type": "multipart/form-data; boundary=BB"}) == 400
        # oversized declared body
        req = urllib.request.Request(
            base + "/api/predict", data=b"x",
            headers={"Content-Type": "application/json",
                     "Content-Length": str(100 * 1024 * 1024)},
        )
        # urllib overrides Content-Length from data; go lower level
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/api/predict")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(100 * 1024 * 1024))
        conn.endheaders()
        conn.send(b"x")
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()
    finally:
        server.shutdown()


def test_load_rerank_inputs_explicit_data_dir(tmp_path, capsys):
    """records_cache.json resolution: explicit --data wins, run.parent is
    the fallback, and a miss warns loudly (regression: eval-ret --variants
    silently ran with empty labels_by_id when the run dir was not nested
    in the data dir, collapsing every ablation toward baseline)."""
    import json

    import numpy as np

    from mmrp_tpu.serve.runner import load_rerank_inputs

    data = tmp_path / "data"
    data.mkdir()
    recs = [{"id": "r0", "labels": [1, 0, 1], "report_text": "t"}]
    (data / "records_cache.json").write_text(json.dumps({"records": recs}))
    run = tmp_path / "elsewhere" / "run"
    run.mkdir(parents=True)

    # explicit data_dir: found even though run.parent has no cache
    labels, records, kg = load_rerank_inputs(run, data_dir=str(data))
    assert set(labels) == {"r0"}
    np.testing.assert_array_equal(labels["r0"], [1, 0, 1])
    assert records["r0"]["report_text"] == "t"
    assert kg == {}

    # no data_dir, nothing at run.parent: empty + loud warning
    capsys.readouterr()
    labels, records, kg = load_rerank_inputs(run)
    assert labels == {} and records == {}
    assert "records_cache.json not found" in capsys.readouterr().out

    # run.parent fallback (the cli train --out D/train layout)
    (run.parent / "records_cache.json").write_text(
        json.dumps({"records": recs}))
    labels, _, _ = load_rerank_inputs(run)
    assert set(labels) == {"r0"}
