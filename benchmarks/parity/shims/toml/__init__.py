"""`toml` package shim backed by stdlib tomllib (read-only)."""

import tomllib


def load(path):
    if hasattr(path, "read"):
        data = path.read()
        if isinstance(data, str):
            data = data.encode()
        return tomllib.loads(data.decode())
    with open(path, "rb") as f:
        return tomllib.load(f)


def loads(text: str):
    return tomllib.loads(text)
