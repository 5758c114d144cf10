"""Adapter database parity: every set name, sequence, and derived property
must match the reference's porechop/adapters.py exactly — the fixture-driven
CLI tests only exercise a handful of sets, so the other ~110 are locked down
here by direct comparison against the reference module."""

import importlib.util
import os

import pytest

from porechop_tpu import adapters as ours

REF = '/root/reference/porechop/adapters.py'


def _load_ref():
    spec = importlib.util.spec_from_file_location('ref_adapters', REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


pytestmark = pytest.mark.skipif(not os.path.isfile(REF),
                                reason='reference unavailable')


def test_adapter_sets_match_reference():
    ref = _load_ref()
    assert len(ours.ADAPTERS) == len(ref.ADAPTERS)
    for a, b in zip(ours.ADAPTERS, ref.ADAPTERS):
        assert a.name == b.name
        assert tuple(a.start_sequence) == tuple(b.start_sequence)
        assert tuple(a.end_sequence) == tuple(b.end_sequence)
        assert a.is_barcode() == b.is_barcode()
        if a.is_barcode():
            assert a.barcode_direction() == b.barcode_direction()
        assert a.get_barcode_name() == b.get_barcode_name()


@pytest.mark.parametrize('i', [1, 12, 49, 96])
def test_full_barcode_constructors_match_reference(i):
    ref = _load_ref()
    pairs = [(ours.make_old_full_rapid_barcode_adapter,
              ref.make_old_full_rapid_barcode_adapter),
             (ours.make_new_full_rapid_barcode_adapter,
              ref.make_new_full_rapid_barcode_adapter)]
    if i <= 12:   # native uses reverse barcodes, which exist only for 1-12
        pairs.append((ours.make_full_native_barcode_adapter,
                      ref.make_full_native_barcode_adapter))
    for mk_ours, mk_ref in pairs:
        a, b = mk_ours(i), mk_ref(i)
        assert a.name == b.name
        assert tuple(a.start_sequence) == tuple(b.start_sequence)
        assert tuple(a.end_sequence or ()) == tuple(b.end_sequence or ())
