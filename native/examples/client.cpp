// Minimal C++ telemetry client (parity: libs/db/examples/client-batched.cpp):
// connects to elodin-db, streams IMU-style rows, appends an event message.
//
// Build:  g++ -std=c++20 -O2 -I../include client.cpp -o client
// Run:    ./client <port> [rows]

#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "elodin_db.hpp"

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s <port> [rows]\n", argv[0]);
        return 1;
    }
    uint16_t port = static_cast<uint16_t>(std::atoi(argv[1]));
    int rows = argc > 2 ? std::atoi(argv[2]) : 100;

    elodin::Client client("127.0.0.1", port);
    elodin::TableWriter writer(client, {
        {"cpp.imu.accel", elodin::PrimType::F64, {3}},
        {"cpp.imu.gyro", elodin::PrimType::F64, {3}},
        {"cpp.status", elodin::PrimType::U32, {}},
    });

    int64_t t0 = 1'700'000'000'000'000;  // fixed epoch for testability
    for (int i = 0; i < rows; i++) {
        double accel[3] = {0.0, 0.0, -9.81 + 0.01 * i};
        double gyro[3] = {0.001 * i, 0.0, 0.0};
        uint32_t status = static_cast<uint32_t>(i);
        writer.write(t0 + i * 1000,
                     {accel, gyro, &status});
    }

    const char* payload = "{\"event\": \"boot\"}";
    client.send_msg("cpp.events", payload, std::strlen(payload), t0);

    std::printf("wrote %d rows (row size %zu)\n", rows, writer.row_size());
    return 0;
}
