"""omhttp goldens (contrib/omhttp; tests omhttp-{basic,batch-*,auth,
multiplehttpheaders,batch-jsonarray-compress,batch-dynrestpath}.sh):
batch serializer formats, auth headers, custom headers, gzip bodies,
and per-message dynamic REST paths against a recording HTTP server —
the omhttp_dummy_server analog."""

import gzip
import json
import threading

import pytest

from rsyslog_spark.config.runtime import run_config_batch


class _RecordingHttp:
    def __init__(self):
        import http.server

        srv = self

        class H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if (self.headers.get("Content-Encoding") or "") \
                        .lower() == "gzip":
                    body = gzip.decompress(body)
                srv.requests.append({
                    "path": self.path,
                    "body": body.decode("utf-8", errors="replace"),
                    "headers": {k: v for k, v in self.headers.items()},
                })
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"{}")

        self.requests: list = []
        self.httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), H)
        self.port = self.httpd.server_address[1]
        self.t = threading.Thread(target=self.httpd.serve_forever,
                                  kwargs={"poll_interval": 0.2},
                                  daemon=True)
        self.t.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture
def http_srv():
    s = _RecordingHttp()
    yield s
    s.close()


def _run(spark, tmp_path, action_params, n=6, sub="o"):
    src = tmp_path / f"in_{sub}.log"
    src.write_text("".join(
        f"<13>Mar  1 10:00:00 h t: msgnum:{i:08d}:\n"
        for i in range(n)))
    conf = f'''
template(name="tpl" type="string"
         string="{{\\"msgnum\\":\\"%msg:F,58:2%\\"}}")
ruleset(name="m") {{
  if $msg contains "msgnum:" then
      action(type="omhttp" template="tpl" {action_params})
}}
input(type="imfile" file="{src}" ruleset="m")
'''
    run_config_batch(spark, conf)


def _msgnums(reqs, fmt):
    out = []
    for r in reqs:
        if fmt == "jsonarray":
            out += [d["msgnum"] for d in json.loads(r["body"])]
        elif fmt == "kafkarest":
            out += [d["value"]["msgnum"]
                    for d in json.loads(r["body"])["records"]]
        elif fmt == "newline":
            out += [json.loads(l)["msgnum"]
                    for l in r["body"].splitlines() if l]
    return sorted(out)


def test_batch_jsonarray(spark, tmp_path, http_srv):
    """omhttp-batch-jsonarray.sh: '[{...},{...}]' bodies, parsed
    json elements, full sequence across batches."""
    _run(spark, tmp_path, f'''server="127.0.0.1"
         serverport="{http_srv.port}" restpath="my/endpoint"
         batch="on" batch.format="jsonarray" batch.maxsize="4"''',
         n=10, sub="ja")
    assert all(r["path"] == "/my/endpoint" for r in http_srv.requests)
    assert _msgnums(http_srv.requests, "jsonarray") == [
        f"{i:08d}" for i in range(10)]
    assert all(r["body"].startswith("[") for r in http_srv.requests)


def test_batch_kafkarest(spark, tmp_path, http_srv):
    """omhttp-batch-kafkarest.sh: '{"records":[{"value":...}]}'
    bodies with the kafka content type."""
    _run(spark, tmp_path, f'''server="127.0.0.1"
         serverport="{http_srv.port}" restpath="topics/t1"
         batch="on" batch.format="kafkarest" batch.maxsize="3"''',
         n=6, sub="kr")
    assert _msgnums(http_srv.requests, "kafkarest") == [
        f"{i:08d}" for i in range(6)]
    assert http_srv.requests[0]["headers"]["Content-Type"] == \
        "application/vnd.kafka.json.v2+json"


def test_batch_newline_and_nonbatch(spark, tmp_path, http_srv):
    """omhttp-batch-newline.sh + omhttp-basic.sh: newline bodies;
    batch='off' posts one request per message."""
    _run(spark, tmp_path, f'''server="127.0.0.1"
         serverport="{http_srv.port}" restpath="nl"
         batch="on" batch.format="newline" batch.maxsize="100"''',
         n=5, sub="nl")
    assert _msgnums(http_srv.requests, "newline") == [
        f"{i:08d}" for i in range(5)]
    http_srv.requests.clear()
    _run(spark, tmp_path, f'''server="127.0.0.1"
         serverport="{http_srv.port}" restpath="single"''',
         n=3, sub="s1")
    assert len(http_srv.requests) == 3     # one POST per message


def test_auth_and_headers(spark, tmp_path, http_srv):
    """omhttp-auth.sh + omhttp-multiplehttpheaders.sh: basic auth
    from uid/pwd; httpheaderkey/value plus the httpheaders array."""
    _run(spark, tmp_path, f'''server="127.0.0.1"
         serverport="{http_srv.port}" restpath="a"
         uid="user" pwd="pass"
         httpheaderkey="X-Custom" httpheadervalue="v1"
         httpheaders=["X-One: 1", "X-Two: 2"]''', n=2, sub="au")
    h = http_srv.requests[0]["headers"]
    import base64
    assert h["Authorization"] == "Basic " + base64.b64encode(
        b"user:pass").decode()
    assert h["X-Custom"] == "v1"
    assert h["X-One"] == "1" and h["X-Two"] == "2"


def test_batch_jsonarray_compress(spark, tmp_path, http_srv):
    """omhttp-batch-jsonarray-compress.sh: compress='on' gzips the
    body (the server inflates via Content-Encoding)."""
    _run(spark, tmp_path, f'''server="127.0.0.1"
         serverport="{http_srv.port}" restpath="gz"
         batch="on" batch.format="jsonarray" batch.maxsize="100"
         compress="on" compress.level="4"''', n=4, sub="gz")
    r = http_srv.requests[0]
    assert r["headers"]["Content-Encoding"] == "gzip"
    assert _msgnums([r], "jsonarray") == [
        f"{i:08d}" for i in range(4)]


def test_batch_dynrestpath(spark, tmp_path, http_srv):
    """omhttp-batch-dynrestpath.sh: restpath names a template
    rendered per message; batches group by rendered path."""
    src = tmp_path / "in_dyn.log"
    src.write_text(
        "<13>Mar  1 10:00:00 h t: msgnum:0 groupA\n"
        "<13>Mar  1 10:00:00 h t: msgnum:1 groupB\n"
        "<13>Mar  1 10:00:00 h t: msgnum:2 groupA\n")
    conf = f'''
template(name="tpl" type="string" string="%msg%")
template(name="pathtpl" type="string"
         string="endpoint/%msg:F,32:2%")
ruleset(name="m") {{
  action(type="omhttp" template="tpl" server="127.0.0.1"
         serverport="{http_srv.port}" restpath="pathtpl"
         dynrestpath="on" batch="on" batch.format="newline"
         batch.maxsize="100")
}}
input(type="imfile" file="{src}" ruleset="m")
'''
    run_config_batch(spark, conf)
    paths = {}
    for r in http_srv.requests:
        paths.setdefault(r["path"], []).append(r["body"])
    assert set(paths) == {"/endpoint/groupA", "/endpoint/groupB"}
    ga = "\n".join(paths["/endpoint/groupA"])
    assert "msgnum:0" in ga and "msgnum:2" in ga
    assert "msgnum:1" in "\n".join(paths["/endpoint/groupB"])


def test_serializers_drop_unparseable_json():
    """omhttp.c:1659/1709/1757: messages that fail JSON parsing are
    SKIPPED from jsonarray/kafkarest/lokirest batches ('failed to
    parse %s as json ignoring it') — only newline keeps raw text."""
    import warnings

    from rsyslog_spark.streaming.sinks import omhttp_serialize

    chunk = ['{"a":1}', "not json", '{"b":2}']
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        body, _ = omhttp_serialize(chunk, "jsonarray")
        assert json.loads(body) == [{"a": 1}, {"b": 2}]
        body, _ = omhttp_serialize(chunk, "kafkarest")
        assert json.loads(body) == {
            "records": [{"value": {"a": 1}}, {"value": {"b": 2}}]}
        body, _ = omhttp_serialize(chunk, "lokirest")
        assert json.loads(body) == {"streams": [{"a": 1}, {"b": 2}]}
    body, _ = omhttp_serialize(chunk, "newline")
    assert body == b'{"a":1}\nnot json\n{"b":2}'
    # the skip is warned, mirroring the reference's LogError line
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        omhttp_serialize(["nope"], "jsonarray")
    assert any("ignoring it" in str(x.message) for x in w)
