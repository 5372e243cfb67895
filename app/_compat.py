"""Flask-compatible micro layer.

Production deploys install real Flask (requirements-app.txt); this image
ships only Werkzeug + Jinja2, so a ~100-line WSGI shim provides the subset
the app uses (``Flask``, ``route``/``get``/``post``, ``jsonify``,
``render_template``, ``test_client``). Real Flask is preferred whenever it
is importable — the handler code is identical either way.
"""
from __future__ import annotations

try:  # pragma: no cover - exercised in the production container
    from flask import Flask, jsonify, render_template  # noqa: F401

    USING_REAL_FLASK = True
except ModuleNotFoundError:
    USING_REAL_FLASK = False

    import json as _json
    from pathlib import Path

    import jinja2
    from werkzeug.routing import Map, Rule
    from werkzeug.test import Client
    from werkzeug.wrappers import Request, Response

    _current_app = None

    def jsonify(*args, **kwargs):
        payload = kwargs if kwargs else (args[0] if len(args) == 1 else list(args))
        return Response(_json.dumps(payload), mimetype="application/json")

    def render_template(name: str, **context) -> str:
        return _current_app.jinja_env.get_template(name).render(**context)

    class Flask:
        """Tiny WSGI app with werkzeug routing and Flask-ish decorators."""

        def __init__(self, import_name: str):
            self.import_name = import_name
            root = Path(import_name.replace(".", "/")).resolve().parent \
                if "." in import_name else Path.cwd() / "app"
            # templates/static live next to the defining module
            import sys

            mod = sys.modules.get(import_name)
            if mod is not None and getattr(mod, "__file__", None):
                root = Path(mod.__file__).resolve().parent
            self.root = root
            self.template_dir = root / "templates"
            self.static_dir = root / "static"
            self.jinja_env = jinja2.Environment(
                loader=jinja2.FileSystemLoader(str(self.template_dir)),
                autoescape=jinja2.select_autoescape(["html"]),
            )
            self.jinja_env.policies["json.dumps_function"] = _json.dumps
            self.jinja_env.filters.setdefault(
                "tojson", lambda v: _json.dumps(v)
            )
            self.url_map = Map()
            self.view_funcs: dict[str, callable] = {}
            self.config: dict = {}
            self._register_static()

        # -- decorators ----------------------------------------------------
        def route(self, rule: str, methods=("GET",)):
            def deco(fn):
                endpoint = fn.__name__
                self.url_map.add(Rule(rule, endpoint=endpoint,
                                      methods=list(methods)))
                self.view_funcs[endpoint] = fn
                return fn

            return deco

        def get(self, rule: str):
            return self.route(rule, methods=("GET",))

        def post(self, rule: str):
            return self.route(rule, methods=("POST",))

        def _register_static(self):
            def static_view(filename: str):
                fp = (self.static_dir / filename).resolve()
                if not str(fp).startswith(str(self.static_dir.resolve())) or not fp.exists():
                    return Response("not found", status=404)
                mime = "application/javascript" if fp.suffix == ".js" else (
                    "text/css" if fp.suffix == ".css" else "application/octet-stream")
                return Response(fp.read_bytes(), mimetype=mime)

            self.url_map.add(Rule("/static/<path:filename>", endpoint="static"))
            self.view_funcs["static"] = static_view

        def url_for(self, endpoint: str, **values) -> str:
            if endpoint == "static":
                return f"/static/{values['filename']}"
            return self.url_map.bind("localhost").build(endpoint, values)

        # -- WSGI ----------------------------------------------------------
        def wsgi_app(self, environ, start_response):
            global _current_app
            _current_app = self
            self.jinja_env.globals["url_for"] = self.url_for
            request = Request(environ)
            adapter = self.url_map.bind_to_environ(environ)
            try:
                endpoint, values = adapter.match()
                rv = self.view_funcs[endpoint](**values)
            except Exception as exc:  # includes NotFound
                from werkzeug.exceptions import HTTPException

                if isinstance(exc, HTTPException):
                    return exc(environ, start_response)
                raise
            if isinstance(rv, tuple):
                resp, status = rv
                resp.status_code = status
            elif isinstance(rv, Response):
                resp = rv
            else:
                resp = Response(rv, mimetype="text/html")
            return resp(environ, start_response)

        def __call__(self, environ, start_response):
            return self.wsgi_app(environ, start_response)

        # -- test client -----------------------------------------------------
        def test_client(self):
            client = Client(self)

            class _Ctx:
                def __enter__(_self):
                    return client

                def __exit__(_self, *a):
                    return False

            # werkzeug's Client responses already expose .status_code/.get_json
            return _Ctx()

        def run(self, host="127.0.0.1", port=5000, debug=False, **_):
            from werkzeug.serving import run_simple

            run_simple(host, port, self, use_reloader=False, use_debugger=debug)
