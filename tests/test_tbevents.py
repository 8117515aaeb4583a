"""TensorBoard event writer (obs/tbevents.py).

The reference Recorder logs scalars through tensorboardX
(lib/utils/net_utils.py:174-239); our writer emits the same on-disk
format with zero dependencies.  Pinned here: the crc32c/masking
primitives against published vectors, a write->read round trip through
our own parser, and — when a real TF-stack parser is importable — a
cross-check that IT can read OUR files.
"""

from __future__ import annotations

import glob
import os
import struct

import pytest

from esa_pose_estimation_tpu.obs import tbevents


class TestCrc:
    def test_crc32c_known_vectors(self):
        # RFC 3720 / kernel test vectors for CRC-32C (Castagnoli)
        assert tbevents._crc32c(b'123456789') == 0xE3069283
        assert tbevents._crc32c(b'') == 0
        assert tbevents._crc32c(b'\x00' * 32) == 0x8A9136AA
        assert tbevents._crc32c(b'\xff' * 32) == 0x62A8AB43

    def test_masked_crc_matches_tf_formula(self):
        data = b'hello tensorboard'
        crc = tbevents._crc32c(data)
        expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert tbevents._masked_crc(data) == expect


class TestVarint:
    @pytest.mark.parametrize('n', [0, 1, 127, 128, 300, 2 ** 32, 2 ** 56])
    def test_roundtrip(self, n):
        buf = tbevents._varint(n)
        out, i = tbevents._read_varint(buf, 0)
        assert out == n and i == len(buf)

    def test_negative_int64_two_complement(self):
        # proto int64 serializes negatives as 10-byte two's complement
        buf = tbevents._int64(2, -1)
        fields = list(tbevents._parse_fields(buf))
        assert fields[0][0] == 2
        assert fields[0][2] == 0xFFFFFFFFFFFFFFFF  # reader is unsigned


class TestWriterRoundTrip:
    def test_scalars_roundtrip(self, tmp_path):
        with tbevents.TbWriter(str(tmp_path)) as tb:
            tb.scalars(1, {'train/loss': 0.5, 'train/lr': 1e-4})
            tb.scalars(2, {'train/loss': 0.25})
            tb.scalar(3, 'eval/speed', 0.0193)
            path = tb.path
        rows = tbevents.read_scalars(path)
        assert (1, 'train/loss', 0.5) in rows
        assert (2, 'train/loss', 0.25) in rows
        assert any(s == 3 and t == 'eval/speed' and abs(v - 0.0193) < 1e-6
                   for s, t, v in rows)
        # lr survives f32 quantization
        lr = [v for s, t, v in rows if t == 'train/lr']
        assert lr and abs(lr[0] - 1e-4) < 1e-9

    def test_file_named_like_tensorboard(self, tmp_path):
        tb = tbevents.TbWriter(str(tmp_path))
        tb.close()
        assert os.path.basename(tb.path).startswith('events.out.tfevents.')
        assert glob.glob(str(tmp_path / 'events.out.tfevents.*'))

    def test_first_record_is_file_version(self, tmp_path):
        tb = tbevents.TbWriter(str(tmp_path))
        tb.close()
        with open(tb.path, 'rb') as f:
            data = f.read()
        (n,) = struct.unpack('<Q', data[:8])
        event = data[12:12 + n]
        fields = {f: v for f, _, v in tbevents._parse_fields(event)}
        assert fields[3] == b'brain.Event:2'

    def test_crc_detects_corruption(self, tmp_path):
        tb = tbevents.TbWriter(str(tmp_path))
        tb.scalar(1, 'x', 1.0)
        tb.close()
        with open(tb.path, 'r+b') as f:
            f.seek(-3, os.SEEK_END)
            f.write(b'\xde')
        with pytest.raises(AssertionError):
            tbevents.read_scalars(tb.path)
        # lenient mode still parses the untouched prefix
        rows = tbevents.read_scalars(tb.path, check_crc=False)
        assert isinstance(rows, list)


class TestThirdPartyParser:
    def test_tf_stack_reads_our_file(self, tmp_path):
        """If any real TF-stack event parser is available, it must accept
        our files; skipped cleanly in the no-TF environment."""
        try:
            from tensorboard.backend.event_processing import (
                event_file_loader)
        except Exception:
            pytest.skip('tensorboard not installed')
        tb = tbevents.TbWriter(str(tmp_path))
        tb.scalars(7, {'a/b': 3.5})
        tb.close()
        events = list(
            event_file_loader.EventFileLoader(tb.path).Load())
        scalar_events = [e for e in events if e.HasField('summary')]
        assert scalar_events[0].step == 7
        v = scalar_events[0].summary.value[0]
        assert v.tag == 'a/b'
        # tensorboard's loader data-compat pass may upgrade simple_value
        # into the tensor representation — accept either
        got = (v.tensor.float_val[0] if v.HasField('tensor')
               else v.simple_value)
        assert abs(got - 3.5) < 1e-6
