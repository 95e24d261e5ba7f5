"""Two-party transport for the collaborative prover.

Re-imagines ``mpc_stark::network::QuicTwoPartyNet`` (reference
integration/main.rs:144-146, SURVEY.md §5.8) with two interchangeable
backends:

* :class:`LocalTwoPartyNet` — an in-process queue pair for single-process
  tests and for running both parties on one host (threads);
* :class:`TcpTwoPartyNet` — a length-prefixed TCP socket (party 0 listens,
  party 1 dials), used by the two-process integration harness.

The fabric's communication pattern is strictly round-based (batched opens /
exchanges), so the transport API is a simple blocking
``exchange(payload) -> peer_payload`` plus raw send/recv.  On multi-chip
deployments the same role is played by ICI/DCN collectives between pod
slices; this host transport is the party-to-party (DCN) link.
"""

from __future__ import annotations

import queue
import socket
import struct
import time

from ..utils.errors import NetworkError, SetupFailedError

PARTY0 = 0
PARTY1 = 1


class TwoPartyNetwork:
    """Abstract two-party transport."""

    party_id: int

    def send_bytes(self, payload: bytes) -> None:
        raise NotImplementedError

    def recv_bytes(self) -> bytes:
        raise NotImplementedError

    def exchange_bytes(self, payload: bytes) -> bytes:
        """Send ours, receive the peer's.

        Send and receive run concurrently: with both parties sending first,
        a payload larger than the transport buffer would deadlock two
        blocking ``sendall`` calls (e.g. the batched Beaver round of a large
        circuit).
        """
        import threading

        send_error: list[Exception] = []

        def do_send():
            try:
                self.send_bytes(payload)
            except Exception as exc:  # noqa: BLE001 - re-raised below
                send_error.append(exc)

        sender = threading.Thread(target=do_send)
        sender.start()
        try:
            received = self.recv_bytes()
        finally:
            sender.join()
        if send_error:
            raise send_error[0]
        return received

    def close(self) -> None:
        pass


class LocalTwoPartyNet(TwoPartyNetwork):
    """In-process transport; construct both ends via :func:`make_local_pair`.

    ``latency_s`` injects a one-way link delay per message (a delivery
    timestamp rides the queue; the receiver sleeps until it is due).  Used
    to quantify what the eager fabric's synchronous rounds cost on a real
    party-to-party link vs the reference's pipelined dataflow design
    (reference: mpc-stark's QUIC net between remote relayers).
    """

    def __init__(self, party_id: int, inbox: "queue.Queue", outbox: "queue.Queue",
                 latency_s: float = 0.0):
        self.party_id = party_id
        self._inbox = inbox
        self._outbox = outbox
        self._latency_s = latency_s

    def send_bytes(self, payload: bytes) -> None:
        self._outbox.put((time.monotonic() + self._latency_s, payload))

    def recv_bytes(self) -> bytes:
        try:
            ready_at, payload = self._inbox.get(timeout=60)
        except queue.Empty as exc:
            raise NetworkError("timed out waiting for peer message") from exc
        delay = ready_at - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        return payload


def make_local_pair(latency_s: float = 0.0) -> tuple[LocalTwoPartyNet, LocalTwoPartyNet]:
    q01: queue.Queue = queue.Queue()
    q10: queue.Queue = queue.Queue()
    return (
        LocalTwoPartyNet(PARTY0, inbox=q10, outbox=q01, latency_s=latency_s),
        LocalTwoPartyNet(PARTY1, inbox=q01, outbox=q10, latency_s=latency_s),
    )


class TcpTwoPartyNet(TwoPartyNetwork):
    """Length-prefixed TCP transport (the QUIC net's role in the reference)."""

    def __init__(self, party_id: int, local_addr: tuple[str, int], peer_addr: tuple[str, int]):
        self.party_id = party_id
        self.local_addr = local_addr
        self.peer_addr = peer_addr
        self._sock: socket.socket | None = None

    def connect(self, timeout: float = 30.0) -> None:
        try:
            if self.party_id == PARTY0:
                srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                srv.bind(self.local_addr)
                srv.listen(1)
                srv.settimeout(timeout)
                conn, _ = srv.accept()
                srv.close()
                self._sock = conn
            else:
                deadline = time.time() + timeout
                last_err = None
                while time.time() < deadline:
                    try:
                        sock = socket.create_connection(self.peer_addr, timeout=2.0)
                        self._sock = sock
                        break
                    except OSError as exc:  # peer not up yet
                        last_err = exc
                        time.sleep(0.1)
                if self._sock is None:
                    raise SetupFailedError(f"could not reach peer: {last_err}")
            self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        except OSError as exc:
            raise SetupFailedError(str(exc)) from exc

    def send_bytes(self, payload: bytes) -> None:
        if self._sock is None:
            raise NetworkError("not connected")
        try:
            self._sock.sendall(struct.pack(">I", len(payload)) + payload)
        except OSError as exc:
            raise NetworkError(str(exc)) from exc

    def recv_bytes(self) -> bytes:
        if self._sock is None:
            raise NetworkError("not connected")
        try:
            header = self._recv_exact(4)
            (length,) = struct.unpack(">I", header)
            return self._recv_exact(length)
        except OSError as exc:
            raise NetworkError(str(exc)) from exc

    def _recv_exact(self, count: int) -> bytes:
        buf = bytearray()
        while len(buf) < count:
            chunk = self._sock.recv(count - len(buf))
            if not chunk:
                raise NetworkError("peer closed connection")
            buf += chunk
        return bytes(buf)

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None
