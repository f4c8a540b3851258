// elodin_db.hpp — single-header C++20 client for elodin-db (impeller2 wire)
//
// Parity target: the reference's generated single-header client
// (libs/db/examples/db.hpp + libs/db/cpp/vtable.hpp): connect over TCP,
// register a vtable describing a packed row struct, stream Table packets
// with a shared little-endian i64 microsecond timestamp, and append
// messages to named logs.  Written fresh for this TPU-native stack; the
// wire format is impeller2 (libs/impeller2/src/{types,vtable}.rs).
//
// Usage:
//   elodin::Client c("127.0.0.1", 2240);
//   elodin::TableWriter w(c, {
//       {"drone.imu.accel", elodin::PrimType::F64, {3}},
//       {"drone.cmd.throttle", elodin::PrimType::F64, {}},
//   });
//   w.write(timestamp_us, {accel_ptr, throttle_ptr});

#pragma once

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace elodin {

// ---------------------------------------------------------------- hashing

inline uint64_t component_id(std::string_view name) {
    // FNV-1a 64 (libs/impeller2/src/types.rs:36)
    uint64_t h = 0xcbf29ce484222325ull;
    for (unsigned char c : name) {
        h ^= c;
        h *= 0x100000001b3ull;
    }
    return h;
}

inline void msg_id(std::string_view name, uint8_t out[2]) {
    // fnv1a-32 XOR-folded to 16 bits, avoiding the reserved [224, *] range
    // (libs/impeller2/src/types.rs:592-598)
    uint32_t h = 0x811c9dc5u;
    for (unsigned char c : name) {
        h ^= c;
        h *= 0x01000193u;
    }
    uint16_t id16 = static_cast<uint16_t>((h >> 16) ^ (h & 0xffff));
    out[0] = static_cast<uint8_t>(id16 & 0xff);
    out[1] = static_cast<uint8_t>(id16 >> 8);
    if (out[0] == 224) out[0] = 223;
}

// ---------------------------------------------------------------- postcard

struct Postcard {
    std::vector<uint8_t> buf;

    void u8(uint8_t v) { buf.push_back(v); }
    void raw(const void* p, size_t n) {
        auto* b = static_cast<const uint8_t*>(p);
        buf.insert(buf.end(), b, b + n);
    }
    void varint(uint64_t v) {
        while (true) {
            uint8_t b = v & 0x7f;
            v >>= 7;
            if (v) {
                buf.push_back(b | 0x80);
            } else {
                buf.push_back(b);
                return;
            }
        }
    }
    void bytes(const void* p, size_t n) {
        varint(n);
        raw(p, n);
    }
    void string(std::string_view s) { bytes(s.data(), s.size()); }
};

// ---------------------------------------------------------------- types

enum class PrimType : uint8_t {
    U8 = 0, U16, U32, U64, I8, I16, I32, I64, Bool, F32, F64,
};

inline size_t prim_size(PrimType t) {
    switch (t) {
        case PrimType::U8: case PrimType::I8: case PrimType::Bool: return 1;
        case PrimType::U16: case PrimType::I16: return 2;
        case PrimType::U32: case PrimType::I32: case PrimType::F32: return 4;
        default: return 8;
    }
}

struct FieldSpec {
    std::string name;
    PrimType ty;
    std::vector<uint64_t> shape;

    size_t count() const {
        size_t n = 1;
        for (auto d : shape) n *= d;
        return n;
    }
    size_t nbytes() const { return count() * prim_size(ty); }
};

// ---------------------------------------------------------------- packets

enum PacketTy : uint8_t { Msg = 0, Table = 1, TimeSeries = 2, MsgWithTimestamp = 3 };

inline std::vector<uint8_t> frame(PacketTy ty, const uint8_t id[2],
                                  const uint8_t* body, size_t body_len,
                                  uint8_t req_id = 0) {
    std::vector<uint8_t> out;
    uint32_t n = static_cast<uint32_t>(4 + body_len);
    out.reserve(8 + body_len);
    out.insert(out.end(), reinterpret_cast<uint8_t*>(&n),
               reinterpret_cast<uint8_t*>(&n) + 4);
    out.push_back(ty);
    out.push_back(id[0]);
    out.push_back(id[1]);
    out.push_back(req_id);
    out.insert(out.end(), body, body + body_len);
    return out;
}

// ---------------------------------------------------------------- vtable

// Builds the postcard serialization of VTable { ops, fields, data }
// (libs/impeller2/src/vtable.rs) for a packed row with a shared timestamp
// at offset 0.
class VTableBuilder {
public:
    struct Op {
        uint8_t kind;  // 0 Data, 1 Table, 3 Component, 4 Schema, 5 Timestamp
        uint16_t a = 0, b = 0, c = 0;
    };

    uint16_t push_data(const void* p, size_t n) {
        uint16_t off = static_cast<uint16_t>(data_.size());
        auto* b = static_cast<const uint8_t*>(p);
        data_.insert(data_.end(), b, b + n);
        ops_.push_back({0, off, static_cast<uint16_t>(n)});
        return static_cast<uint16_t>(ops_.size() - 1);
    }
    uint16_t push_table(uint16_t offset, uint16_t len) {
        ops_.push_back({1, offset, len});
        return static_cast<uint16_t>(ops_.size() - 1);
    }
    uint16_t push_component(std::string_view name) {
        uint64_t cid = component_id(name);
        uint16_t d = push_data(&cid, 8);
        ops_.push_back({3, d});
        return static_cast<uint16_t>(ops_.size() - 1);
    }
    uint16_t push_schema(PrimType ty, const std::vector<uint64_t>& shape,
                         uint16_t arg) {
        uint8_t t = static_cast<uint8_t>(ty);
        uint16_t ty_ref = push_data(&t, 1);
        uint16_t dim_ref = push_data(shape.data(), shape.size() * 8);
        ops_.push_back({4, ty_ref, dim_ref, arg});
        return static_cast<uint16_t>(ops_.size() - 1);
    }
    uint16_t push_timestamp(uint16_t table_offset, uint16_t arg) {
        uint16_t src = push_table(table_offset, 8);
        ops_.push_back({5, src, arg});
        return static_cast<uint16_t>(ops_.size() - 1);
    }
    void push_field(uint16_t offset, uint16_t len, uint16_t arg) {
        fields_.push_back({offset, len, arg});
    }

    std::vector<uint8_t> serialize() const {
        Postcard pc;
        pc.varint(ops_.size());
        for (const auto& op : ops_) {
            pc.varint(op.kind);
            switch (op.kind) {
                case 0: case 1:  // Data/Table {offset, len}
                    pc.varint(op.a);
                    pc.varint(op.b);
                    break;
                case 3:  // Component {component_id: OpRef}
                    pc.varint(op.a);
                    break;
                case 4:  // Schema {ty, dim, arg}
                    pc.varint(op.a);
                    pc.varint(op.b);
                    pc.varint(op.c);
                    break;
                case 5:  // Timestamp {source, arg}
                    pc.varint(op.a);
                    pc.varint(op.b);
                    break;
            }
        }
        pc.varint(fields_.size());
        for (const auto& f : fields_) {
            pc.varint(f.offset);
            pc.varint(f.len);
            pc.varint(f.arg);
        }
        pc.bytes(data_.data(), data_.size());
        return pc.buf;
    }

private:
    struct Field {
        uint16_t offset, len, arg;
    };
    std::vector<Op> ops_;
    std::vector<Field> fields_;
    std::vector<uint8_t> data_;
};

// ---------------------------------------------------------------- client

class Client {
public:
    Client(const std::string& host, uint16_t port) {
        fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
        if (fd_ < 0) throw std::runtime_error("socket failed");
        int one = 1;
        ::setsockopt(fd_, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
        sockaddr_in addr{};
        addr.sin_family = AF_INET;
        addr.sin_port = htons(port);
        if (::inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1)
            throw std::runtime_error("bad address");
        if (::connect(fd_, reinterpret_cast<sockaddr*>(&addr), sizeof addr) < 0)
            throw std::runtime_error("connect failed");
    }
    ~Client() {
        if (fd_ >= 0) ::close(fd_);
    }
    Client(const Client&) = delete;
    Client& operator=(const Client&) = delete;

    void send_all(const std::vector<uint8_t>& data) {
        size_t off = 0;
        while (off < data.size()) {
            ssize_t n = ::send(fd_, data.data() + off, data.size() - off, 0);
            if (n <= 0) throw std::runtime_error("send failed");
            off += static_cast<size_t>(n);
        }
    }

    // append a message with a timestamp to the log named `name`
    void send_msg(std::string_view name, const void* payload, size_t len,
                  int64_t timestamp_us) {
        uint8_t id[2];
        msg_id(name, id);
        std::vector<uint8_t> body(8 + len);
        std::memcpy(body.data(), &timestamp_us, 8);
        std::memcpy(body.data() + 8, payload, len);
        send_all(frame(MsgWithTimestamp, id, body.data(), body.size()));
    }

    void set_component_metadata(std::string_view name,
                                std::string_view element_names = "") {
        // SetComponentMetadata (wkt/src/msgs.rs:205): transparent
        // ComponentMetadata {component_id, name, metadata}
        Postcard pc;
        pc.varint(component_id(name));
        pc.string(name);
        if (element_names.empty()) {
            pc.varint(0);
        } else {
            pc.varint(1);
            pc.string("element_names");
            pc.string(element_names);
        }
        uint8_t id[2];
        // auto-derived ID of the Rust type name
        msg_id_raw("SetComponentMetadata", id);
        send_all(frame(Msg, id, pc.buf.data(), pc.buf.size()));
    }

    int fd() const { return fd_; }

    static void msg_id_raw(std::string_view type_name, uint8_t out[2]) {
        // auto Msg::ID without the 224-avoidance remap (types.rs:588-590)
        uint32_t h = 0x811c9dc5u;
        for (unsigned char c : type_name) {
            h ^= c;
            h *= 0x01000193u;
        }
        uint16_t id16 = static_cast<uint16_t>((h >> 16) ^ (h & 0xffff));
        out[0] = static_cast<uint8_t>(id16 & 0xff);
        out[1] = static_cast<uint8_t>(id16 >> 8);
    }

private:
    int fd_ = -1;
};

// One aligned Table packet per row, shared i64 microsecond timestamp at
// offset 0, fields ordered by descending alignment.
class TableWriter {
public:
    // default vtable id auto-increments per writer: a shared fixed id
    // would let a second writer's registration silently clobber the
    // first's layout on the server
    TableWriter(Client& client, std::vector<FieldSpec> fields,
                uint16_t vtable_id = 0)
        : client_(client), fields_(std::move(fields)) {
        if (vtable_id == 0) vtable_id = next_auto_id();
        id_[0] = static_cast<uint8_t>(vtable_id & 0xff);
        id_[1] = static_cast<uint8_t>(vtable_id >> 8);

        size_t offset = 8;
        VTableBuilder vb;
        offsets_.reserve(fields_.size());
        for (const auto& f : fields_) {
            size_t align = prim_size(f.ty);
            offset += (align - offset % align) % align;
            offsets_.push_back(offset);
            uint16_t comp = vb.push_component(f.name);
            uint16_t schema = vb.push_schema(f.ty, f.shape, comp);
            uint16_t ts = vb.push_timestamp(0, schema);
            if (offset > 0xffff || f.nbytes() > 0xffff) {
                throw std::runtime_error(
                    "TableWriter: field offset/size exceeds the 16-bit "
                    "builder limit (row > 64 KiB)");
            }
            vb.push_field(static_cast<uint16_t>(offset),
                          static_cast<uint16_t>(f.nbytes()), ts);
            offset += f.nbytes();
        }
        row_size_ = offset;

        // VTableMsg { id: PacketId, vtable } (wkt/src/msgs.rs:19)
        Postcard pc;
        pc.raw(id_, 2);
        auto vt = vb.serialize();
        pc.raw(vt.data(), vt.size());
        uint8_t mid[2];
        Client::msg_id_raw("VTableMsg", mid);
        client_.send_all(frame(Msg, mid, pc.buf.data(), pc.buf.size()));
        for (const auto& f : fields_) client_.set_component_metadata(f.name);
    }

    size_t row_size() const { return row_size_; }

    // `values[i]` points at fields_[i].nbytes() of little-endian data
    void write(int64_t timestamp_us, const std::vector<const void*>& values) {
        if (values.size() != fields_.size())
            throw std::runtime_error("value count mismatch");
        std::vector<uint8_t> row(row_size_, 0);
        std::memcpy(row.data(), &timestamp_us, 8);
        for (size_t i = 0; i < fields_.size(); i++) {
            std::memcpy(row.data() + offsets_[i], values[i],
                        fields_[i].nbytes());
        }
        client_.send_all(frame(Table, id_, row.data(), row.size()));
    }

private:
    static uint16_t next_auto_id() {
        // process-wide counter in the user-table range, skipping the
        // [224,*] reserved low byte
        static uint16_t counter = 0x4242;
        uint16_t id = ++counter;
        if ((id & 0xff) == 224) id = ++counter;
        return id;
    }

    Client& client_;
    std::vector<FieldSpec> fields_;
    std::vector<size_t> offsets_;
    size_t row_size_ = 0;
    uint8_t id_[2];
};

}  // namespace elodin
