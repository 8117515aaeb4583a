"""Byte-level telemetry-frame parity against the ACTUAL reference tcp_send.py.

Runs both the reference ``tcp_send`` (tcp_send.py:9-38) and our
``obs.logger.TcpPusher`` against a loopback TCP server and asserts the
wire bytes are identical: ``\\runlog`` marker, CRLF-separated
proname/ltype/classname/data fields, NUL terminator.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os
import socket
import threading

import pytest

REF_PATH = '/root/reference/tcp_send.py'

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')


class _Server:
    """One-connection loopback sink collecting n_frames NUL-framed records."""

    def __init__(self):
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.bind(('127.0.0.1', 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.data = b''

    def collect(self, n_frames):
        def run():
            conn, _ = self.srv.accept()
            with conn:
                while self.data.count(b'\0') < n_frames:
                    chunk = conn.recv(4096)
                    if not chunk:
                        break
                    self.data += chunk
        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t


def _load_ref():
    spec = importlib.util.spec_from_file_location('ref_tcp', REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PAYLOADS = [('12.5/0.003', 'log', 'esa'), ('epoch done', 'load', 'esa')]


def test_send_frames_byte_identical():
    from esa_pose_estimation_tpu.obs.logger import TcpPusher
    ref_mod = _load_ref()

    # reference side
    ref_srv = _Server()
    t1 = ref_srv.collect(len(PAYLOADS))
    ref = ref_mod.tcp_send('127.0.0.1', ref_srv.port)
    ref.sock.connect(('127.0.0.1', ref_srv.port))  # skip handshake frames
    for data, typ, cls in PAYLOADS:
        ref.send(data, type=typ, classname=cls)
    ref.close()
    t1.join(timeout=5)

    # our side (same proname; sock injected to skip the handshake, which
    # is timestamped and tested separately below)
    our_srv = _Server()
    t2 = our_srv.collect(len(PAYLOADS))
    ours = TcpPusher('127.0.0.1', our_srv.port, proname='esa')
    ours.sock = socket.create_connection(('127.0.0.1', our_srv.port))
    for data, typ, cls in PAYLOADS:
        assert ours.send(data, type=typ, classname=cls)
    ours.close()
    t2.join(timeout=5)

    assert our_srv.data == ref_srv.data
    assert ref_srv.data.count(b'\0') == len(PAYLOADS)


def test_handshake_structure_matches_reference():
    """create_socket announces a timestamp on both channels
    (tcp_send.py:23-25); timestamps differ run-to-run so compare frame
    structure with the data field masked."""
    from esa_pose_estimation_tpu.obs.logger import TcpPusher

    srv = _Server()
    t = srv.collect(2)
    ours = TcpPusher('127.0.0.1', srv.port, proname='esa')
    assert ours.create_socket(classname='cat')
    ours.close()
    t.join(timeout=5)

    frames = srv.data.split(b'\0')[:2]
    for frame, ltype in zip(frames, (b'log', b'load')):
        lines = frame.split(b'\r\n')
        assert lines[0] == b'\\runlog'
        assert lines[1] == b'proname:esa'
        assert lines[2] == b'ltype:' + ltype
        assert lines[3] == b'classname:cat'
        assert lines[4].startswith(b'data:')


def test_dead_endpoint_is_fail_soft():
    """Parity with the reference's print-and-return-False (tcp_send.py:18-22)."""
    from esa_pose_estimation_tpu.obs.logger import TcpPusher
    pusher = TcpPusher('127.0.0.1', 1)   # nothing listens on port 1
    assert pusher.create_socket() is False
    assert pusher.send('x') is False
