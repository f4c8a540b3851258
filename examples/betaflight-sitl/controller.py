"""External flight controller for the lockstep example: a standalone UDP
process playing the betaflight-SITL role — receives vehicle state, replies
with motor commands, in strict lockstep with the sim tick."""

import socket
import struct
import sys

STATE_PORT = int(sys.argv[1]) if len(sys.argv) > 1 else 9103
CMD_PORT = int(sys.argv[2]) if len(sys.argv) > 2 else 9104

KP_ALT, KD_ALT = 8.0, 5.0
HOVER = 9.81  # thrust per unit mass at hover (sim accel = thrust - g)


def main() -> None:
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", STATE_PORT))
    sock.settimeout(30.0)
    while True:
        try:
            raw, _ = sock.recvfrom(65536)
        except socket.timeout:
            return
        tick, z, vz = struct.unpack_from("<Qdd", raw)
        thrust = HOVER + KP_ALT * (2.0 - z) - KD_ALT * vz
        thrust = max(0.0, min(thrust, 20.0))
        sock.sendto(
            struct.pack("<Qd", tick, thrust), ("127.0.0.1", CMD_PORT)
        )


if __name__ == "__main__":
    main()
