"""The package-root frame-level API must stay importable: every lazy
export resolves to a callable, and unknown names raise AttributeError."""

from __future__ import annotations

import pytest

import ct_clickhouse_spark as ct


def test_every_frame_api_export_resolves():
    assert ct._FRAME_API, "frame API should not be empty"
    for name in ct._FRAME_API:
        assert callable(getattr(ct, name)), name
    assert set(ct._FRAME_API) <= set(dir(ct))


def test_unknown_attribute_raises():
    with pytest.raises(AttributeError):
        ct.definitely_not_an_operator
