"""BT2SRV client (ref: pat.cpp:2221-2789 PatternSourceWebClient).

Speaks the same wire protocol as the reference's -DBT2WEBCLIENT binary:
PUT handshake with chunked tab6 upload, SAM streamed back until the
"@CO BT2SRV All Done" terminator. Unlike the reference client (which
substitutes 4-hex-digit slot names to bound its name-restoration buffer,
pat.h:2464-2550), this client streams real read names — the server echoes
QNAMEs, so no restoration pass is needed; memory is bounded by the socket
buffers instead.
"""
from __future__ import annotations

import socket

RE_PER_PACKET = 40  # reads per HTTP chunk (ref: pat.h:2451)


class Bt2Client:
    def __init__(self, host: str = "localhost", port: int = 8080,
                 index_name: str = "index"):
        self.sock = socket.create_connection((host, port))
        self.rfile = self.sock.makefile("rb")
        req = (f"PUT /BT2SRV/{index_name}/align HTTP/1.1\r\n"
               f"Host: {host}:{port}\r\n"
               "User-Agent: BT2CLT\r\n"
               "Accept: */*\r\n"
               "Transfer-Encoding: chunked\r\n"
               "X-BT2SRV-Request-Terminator: 1\r\n\r\n")
        self.sock.sendall(req.encode())
        # response header + config (ref: pat.cpp:2439-2484 fdInit)
        self.config = {}
        status = self.rfile.readline()
        if b"200" not in status:
            raise ConnectionError(f"server refused: {status!r}")
        while True:
            line = self.rfile.readline().rstrip(b"\r\n")
            if not line:
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                self.config[k.decode().strip()] = v.decode().strip()
        if self.config.get("X-BT2SRV-Terminator") != "1":
            raise ConnectionError("server did not promise a terminator")

    def send_reads(self, rows):
        """rows: iterable of (name, seq, qual) or
        (name1, seq1, qual1, name2, seq2, qual2)."""
        pack = []
        for row in rows:
            parts = [x.decode() if isinstance(x, bytes) else str(x)
                     for x in row]
            pack.append("\t".join(parts) + "\n")
            if len(pack) >= RE_PER_PACKET:
                self._send_chunk("".join(pack))
                pack = []
        if pack:
            self._send_chunk("".join(pack))

    def _send_chunk(self, payload: str):
        data = payload.encode()
        self.sock.sendall(b"%x\r\n" % len(data) + data + b"\r\n")

    def finish(self):
        """Send the 0-chunk and yield SAM lines until All Done
        (ref: pat.cpp:2551-2556 + 2712-2754)."""
        self.sock.sendall(b"0\r\n\r\n")
        try:
            self.sock.shutdown(socket.SHUT_WR)
        except OSError:
            pass
        for raw in self.rfile:
            line = raw.rstrip(b"\n")
            if line.startswith(b"@CO BT2SRV All Done"):
                break
            if line.startswith(b"@CO END READ"):
                continue
            yield line.decode()
        self.sock.close()
