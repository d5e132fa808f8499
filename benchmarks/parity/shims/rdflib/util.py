def guess_format(path: str, fmap=None) -> str:
    if path.endswith(".nt"):
        return "nt"
    if path.endswith(".ttl"):
        return "turtle"
    return "nt"
