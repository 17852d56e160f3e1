// Native FASTQ chunk parser + token encoder (C ABI, loaded via ctypes).
//
// TPU-native replacement for the reference's host-side hot loops
// (reference: ribodetector/data_loader/fastx_parser.py:15-37 state-machine
// parser and seq_encoder.py:126-145 per-base dict one-hot -- SURVEY.md 3.5
// ranks these the #1 host bottleneck). One pass over a decompressed byte
// buffer yields, per record:
//   - [start, end) byte offsets of the whole 4-line record (end is one past
//     the final newline), so writers can emit verbatim output slices with
//     zero per-read Python string work (quirk #11: headers/qualities pass
//     through unchanged)
//   - token row (A->0 C->1 G->2 T/U->3, other->4=pad; lowercase stays 4 to
//     preserve the FASTQ-not-uppercased quirk #1) truncated/padded to
//     max_len (truncation keeps the FIRST max_len bases, quirk #3)
//   - true sequence length (clipped to max_len) for packed-semantics gather
//   - a "clean" flag: 1 if every line ends with a bare \n and has no
//     trailing whitespace, so buffer[start:end-1] equals the reference's
//     '\n'.join of rstripped lines; dirty records fall back to Python.
//
// Build: g++ -O3 -shared -fPIC fastx.cpp -o _fastx.so (no Python headers).

#include <cstdint>
#include <cstring>

namespace {

inline const char* find_nl(const char* p, const char* end) {
    const void* q = memchr(p, '\n', static_cast<size_t>(end - p));
    return q ? static_cast<const char*>(q) : nullptr;
}

inline bool ws(char c) { return c == ' ' || c == '\t' || c == '\r' || c == '\v' || c == '\f'; }

struct Lut {
    uint8_t t[256];
    Lut() {
        memset(t, 4, sizeof(t));
        t[static_cast<unsigned char>('A')] = 0;
        t[static_cast<unsigned char>('C')] = 1;
        t[static_cast<unsigned char>('G')] = 2;
        t[static_cast<unsigned char>('T')] = 3;
        t[static_cast<unsigned char>('U')] = 3;
    }
};
const Lut LUT;

}  // namespace

extern "C" {

// Shared FASTQ record framing: skips blank / whitespace-only separator
// lines between records (ADVANCING *consumed past them -- the portable
// parser treats them as empty headers and skips them, io/fastx.py), then
// collects one record's 4 stripped lines. With at_eof, a final line
// missing its newline terminates at buffer end IF it is the 4th line (a
// record cut off earlier than that stays unframed -- the caller surfaces
// the portable parser's Truncated error). Returns 1 when a record was
// framed, else 0 (blanks may still have advanced p/*consumed).
static inline int frame_fastq(
    const char* base, const char** pp, const char* end, int32_t at_eof,
    const char* line_start[4], const char* line_end[4],
    bool* rec_clean, const char** rec_next, int64_t* consumed)
{
    const char* p = *pp;
    // blank-line skip (counts as consumed progress even with no record)
    while (p < end) {
        const char* nl = find_nl(p, end);
        const char* e = nl ? nl : (at_eof ? end : nullptr);
        if (!e) { *pp = p; return 0; }  // partial line, more input coming
        const char* t = e;
        while (t > p && ws(t[-1])) --t;
        if (t != p) break;  // non-blank: a record starts here
        p = nl ? nl + 1 : end;
        *consumed = p - base;
    }
    *pp = p;
    if (p >= end) return 0;
    bool cl = true;
    const char* q = p;
    for (int li = 0; li < 4; ++li) {
        line_start[li] = q;
        const char* nl = find_nl(q, end);
        const char* e;
        if (nl) {
            e = nl;
        } else if (at_eof && li == 3 && q < end) {
            e = end;  // unterminated final qual line: still a line
            cl = false;  // not a verbatim '\n'-terminated slice
        } else {
            return 0;  // mid-record buffer end (or truncated at EOF)
        }
        const char* le = e;
        while (le > q && ws(le[-1])) { --le; cl = false; }
        line_end[li] = le;
        q = nl ? nl + 1 : end;
    }
    *rec_clean = cl;
    *rec_next = q;
    return 1;
}

// Parse up to max_records FASTQ records from buf[0..n).
// Outputs (caller-allocated):
//   offsets: int64[max_records * 2]  -- record [start, end) byte ranges
//   tokens:  uint8[max_records * max_len] (pre-filled or not; fully written)
//   lengths: int32[max_records]
//   clean:   uint8[max_records]
// Returns the number of complete records parsed; *consumed is set to the
// byte offset just past the last complete record OR past trailing blank
// lines (resume point for streaming). at_eof finalizes an unterminated
// final record; a record cut off before its 4th line stays unconsumed so
// the caller can raise the truncation error.
int64_t rd_parse_fastq(
    const char* buf, int64_t n, int32_t at_eof,
    int64_t max_records, int32_t max_len,
    int64_t* offsets, uint8_t* tokens, int32_t* lengths, uint8_t* clean,
    int64_t* consumed)
{
    const char* base = buf;
    const char* p = buf;
    const char* end = buf + n;
    int64_t rec = 0;
    *consumed = 0;

    while (rec < max_records && p < end) {
        const char* line_start[4];
        const char* line_end[4];
        bool rec_clean;
        const char* q;
        if (!frame_fastq(base, &p, end, at_eof, line_start, line_end,
                         &rec_clean, &q, consumed))
            break;

        const char* s = line_start[1];
        const char* se = line_end[1];
        int32_t L = static_cast<int32_t>(se - s);
        if (L > max_len) L = max_len;
        uint8_t* trow = tokens + rec * static_cast<int64_t>(max_len);
        int32_t i = 0;
        for (; i < L; ++i) trow[i] = LUT.t[static_cast<unsigned char>(s[i])];
        for (; i < max_len; ++i) trow[i] = 4;

        offsets[rec * 2] = p - base;
        offsets[rec * 2 + 1] = q - base;
        lengths[rec] = L;
        clean[rec] = rec_clean ? 1 : 0;
        ++rec;
        p = q;
        *consumed = p - base;
    }
    return rec;
}

// Variant of rd_parse_fastq emitting base-5 PACKED tokens: 3 tokens per
// byte, b = t0 + 5*t1 + 25*t2 (all-pad byte = 124; bytes never exceed 124).
// Packing here is ~free (the encoder already touches every base) and cuts
// the host->TPU transfer 3x -- the dominant per-batch cost over the
// tunneled interconnect. The device unpacks with two integer divmods
// (ops/dispatch.py unpack_b5_tokens).
// packed: uint8[max_records * packed_len], packed_len = (max_len + 2) / 3.
int64_t rd_parse_fastq_b5(
    const char* buf, int64_t n, int32_t at_eof,
    int64_t max_records, int32_t max_len, int32_t packed_len,
    int64_t* offsets, uint8_t* packed, int32_t* lengths, uint8_t* clean,
    int64_t* consumed)
{
    const char* base = buf;
    const char* p = buf;
    const char* end = buf + n;
    int64_t rec = 0;
    *consumed = 0;

    while (rec < max_records && p < end) {
        const char* line_start[4];
        const char* line_end[4];
        bool rec_clean;
        const char* q;
        if (!frame_fastq(base, &p, end, at_eof, line_start, line_end,
                         &rec_clean, &q, consumed))
            break;

        const char* s = line_start[1];
        const char* se = line_end[1];
        int32_t L = static_cast<int32_t>(se - s);
        if (L > max_len) L = max_len;
        uint8_t* prow = packed + rec * static_cast<int64_t>(packed_len);
        int32_t i = 0, j = 0;
        for (; i + 3 <= L; i += 3, ++j) {
            prow[j] = static_cast<uint8_t>(
                LUT.t[static_cast<unsigned char>(s[i])]
                + 5 * LUT.t[static_cast<unsigned char>(s[i + 1])]
                + 25 * LUT.t[static_cast<unsigned char>(s[i + 2])]);
        }
        if (i < L) {  // partial trailing trio: missing slots are pad (4)
            uint8_t t0 = LUT.t[static_cast<unsigned char>(s[i])];
            uint8_t t1 = (i + 1 < L) ? LUT.t[static_cast<unsigned char>(s[i + 1])] : 4;
            prow[j++] = static_cast<uint8_t>(t0 + 5 * t1 + 25 * 4);
        }
        for (; j < packed_len; ++j) prow[j] = 124;  // 4 + 5*4 + 25*4

        offsets[rec * 2] = p - base;
        offsets[rec * 2 + 1] = q - base;
        lengths[rec] = L;
        clean[rec] = rec_clean ? 1 : 0;
        ++rec;
        p = q;
        *consumed = p - base;
    }
    return rec;
}

// Variant of rd_parse_fastq_b5 ADDITIONALLY emitting 2-bit packed tokens:
// 4 tokens per byte little-endian (b = t0 | t1<<2 | t2<<4 | t3<<6), plus a
// per-record b2ok flag: 1 iff every base is a clean A/C/G/T/U call AND the
// read is exactly max_len long. Such records never need the pad token (4),
// so 2 bits suffice and the host->device transfer drops another 25% vs
// base-5 (the runtime routes b2ok records to a 2-bit lane,
// runtime/native_pipeline.py; everything else keeps the base-5 row).
// The b2 row of a non-b2ok record is left unspecified.
// packed2: uint8[max_records * packed2_len], packed2_len = (max_len+3)/4.
int64_t rd_parse_fastq_b5b2(
    const char* buf, int64_t n, int32_t at_eof,
    int64_t max_records, int32_t max_len, int32_t packed_len,
    int32_t packed2_len,
    int64_t* offsets, uint8_t* packed, uint8_t* packed2,
    int32_t* lengths, uint8_t* clean, uint8_t* b2ok,
    int64_t* consumed)
{
    const char* base = buf;
    const char* p = buf;
    const char* end = buf + n;
    int64_t rec = 0;
    *consumed = 0;

    while (rec < max_records && p < end) {
        const char* line_start[4];
        const char* line_end[4];
        bool rec_clean;
        const char* q;
        if (!frame_fastq(base, &p, end, at_eof, line_start, line_end,
                         &rec_clean, &q, consumed))
            break;

        const char* s = line_start[1];
        const char* se = line_end[1];
        int32_t L = static_cast<int32_t>(se - s);
        if (L > max_len) L = max_len;
        uint8_t* prow = packed + rec * static_cast<int64_t>(packed_len);
        uint8_t* prow2 = packed2 + rec * static_cast<int64_t>(packed2_len);
        bool pure = (static_cast<int32_t>(se - s) == max_len);
        int32_t i = 0, j = 0, j2 = 0;
        uint8_t qbits = 0;
        int32_t qfill = 0;
        for (; i + 3 <= L; i += 3, ++j) {
            uint8_t t0 = LUT.t[static_cast<unsigned char>(s[i])];
            uint8_t t1 = LUT.t[static_cast<unsigned char>(s[i + 1])];
            uint8_t t2 = LUT.t[static_cast<unsigned char>(s[i + 2])];
            prow[j] = static_cast<uint8_t>(t0 + 5 * t1 + 25 * t2);
            pure &= (t0 | t1 | t2) < 4;
            qbits |= static_cast<uint8_t>((t0 & 3) << qfill);
            if (qfill == 6) { prow2[j2++] = qbits; qbits = 0; qfill = 0; }
            else qfill += 2;
            qbits |= static_cast<uint8_t>((t1 & 3) << qfill);
            if (qfill == 6) { prow2[j2++] = qbits; qbits = 0; qfill = 0; }
            else qfill += 2;
            qbits |= static_cast<uint8_t>((t2 & 3) << qfill);
            if (qfill == 6) { prow2[j2++] = qbits; qbits = 0; qfill = 0; }
            else qfill += 2;
        }
        for (; i < L; ++i) {  // trailing partial trio
            uint8_t t = LUT.t[static_cast<unsigned char>(s[i])];
            pure &= t < 4;
            if (i % 3 == 0) prow[j] = t + 5 * 4 + 25 * 4;
            else if (i % 3 == 1) prow[j] = static_cast<uint8_t>(
                prow[j] - 5 * 4 + 5 * t);
            qbits |= static_cast<uint8_t>((t & 3) << qfill);
            if (qfill == 6) { prow2[j2++] = qbits; qbits = 0; qfill = 0; }
            else qfill += 2;
        }
        if (i % 3) ++j;
        if (qfill) prow2[j2++] = qbits;
        for (; j < packed_len; ++j) prow[j] = 124;
        for (; j2 < packed2_len; ++j2) prow2[j2] = 0;

        offsets[rec * 2] = p - base;
        offsets[rec * 2 + 1] = q - base;
        lengths[rec] = L;
        clean[rec] = rec_clean ? 1 : 0;
        b2ok[rec] = pure ? 1 : 0;
        ++rec;
        p = q;
        *consumed = p - base;
    }
    return rec;
}

// FASTA chunk parser + normalizer + base-5 packed encoder.
//
// Reference FASTA semantics (ribodetector/data_loader/fastx_parser.py:40-55,
// mirrored by io/fastx.py seq_parser): every line is strip()-ed, blank lines
// are skipped, a '>' line starts a record, sequence lines are UPPERCASED and
// concatenated; a record completes when the next '>' appears, or at EOF
// (where a trailing record with an empty sequence is dropped). Because the
// reference re-emits records as header + single-line uppercased sequence,
// output for FASTA is NOT a verbatim slice of the input -- so this parser
// writes the NORMALIZED record text ("header\nSEQ\n") into `norm` and the
// offsets index into that buffer (writers gather from it exactly like the
// FASTQ path gathers from the raw window). Normalization can GROW the
// text slightly: an empty-sequence record ">x\n" re-emits as ">x\n\n"
// and an unterminated final line gains its newline, so the worst case is
// 4/3 x the input -- callers size norm_cap accordingly
// (FastaChunkStream allocates win_bytes * 4 / 3 + 16).
//
// at_eof: nonzero when buf ends the file -- finalizes the trailing record
// (a last line without a newline counts as a line, like Python iteration).
// consumed: input-byte resume point (start of the unfinished record).
int64_t rd_parse_fasta_b5(
    const char* buf, int64_t n, int32_t at_eof,
    int64_t max_records, int32_t max_len, int32_t packed_len,
    char* norm, int64_t norm_cap,
    int64_t* offsets, uint8_t* packed, int32_t* lengths,
    int64_t* consumed, int64_t* norm_used)
{
    const char* p = buf;
    const char* end = buf + n;
    int64_t rec = 0;
    int64_t nw = *norm_used;  // append position in norm (caller resets)
    *consumed = 0;

    // scan one stripped line; returns false if the line is incomplete
    // (no newline and not at_eof). ls/le = stripped extent, next = byte
    // after the line (start of the following line).
    auto next_line = [&](const char* q, const char*& ls, const char*& le,
                         const char*& next) -> bool {
        const char* nl = find_nl(q, end);
        const char* e;
        if (nl) { e = nl; next = nl + 1; }
        else if (at_eof && q < end) { e = end; next = end; }
        else return false;
        while (q < e && ws(*q)) ++q;
        while (e > q && ws(e[-1])) --e;
        ls = q; le = e;
        return true;
    };

    while (rec < max_records && p < end) {
        // find the record's header line (skip blanks / pre-header junk)
        const char* ls; const char* le; const char* nx;
        if (!next_line(p, ls, le, nx)) break;
        if (ls == le || *ls != '>') { p = nx; *consumed = p - buf; continue; }

        // collect sequence lines until the next header / end of data
        int64_t hdr_len = le - ls;
        int64_t norm_start = nw;
        if (nw + hdr_len + 1 > norm_cap) break;  // norm full: record re-carried
        memcpy(norm + nw, ls, static_cast<size_t>(hdr_len));
        nw += hdr_len;
        norm[nw++] = '\n';

        uint8_t* prow = packed + rec * static_cast<int64_t>(packed_len);
        int32_t L = 0;          // encoded length (clipped to max_len)
        uint8_t trio[3];
        int32_t tfill = 0;
        int32_t pj = 0;
        bool complete = false;
        const char* q = nx;
        const char* resume = q;
        while (true) {
            const char* sls; const char* sle; const char* snx;
            if (!next_line(q, sls, sle, snx)) {
                complete = at_eof != 0;
                resume = q;
                break;
            }
            if (sls < sle && *sls == '>') {  // next record begins
                complete = true;
                resume = q;  // raw start of the next header's line
                break;
            }
            if (sls == sle) { q = snx; continue; }  // blank line
            // uppercase + append to norm, encode into the packed row
            if (nw + (sle - sls) + 1 > norm_cap) { complete = false; break; }
            for (const char* c = sls; c < sle; ++c) {
                char u = (*c >= 'a' && *c <= 'z') ? static_cast<char>(*c - 32) : *c;
                norm[nw++] = u;
                if (L < max_len) {
                    trio[tfill++] = LUT.t[static_cast<unsigned char>(u)];
                    if (tfill == 3) {
                        prow[pj++] = static_cast<uint8_t>(
                            trio[0] + 5 * trio[1] + 25 * trio[2]);
                        tfill = 0;
                    }
                    ++L;
                }
            }
            q = snx;
        }
        if (!complete) { nw = norm_start; break; }
        bool empty_seq = (nw == norm_start + hdr_len + 1);
        if (empty_seq && resume >= end) { nw = norm_start; break; }  // trailing empty: drop
        norm[nw++] = '\n';
        if (tfill) {
            uint8_t t1 = (tfill > 1) ? trio[1] : 4;
            prow[pj++] = static_cast<uint8_t>(trio[0] + 5 * t1 + 25 * 4);
        }
        for (; pj < packed_len; ++pj) prow[pj] = 124;

        offsets[rec * 2] = norm_start;
        offsets[rec * 2 + 1] = nw;
        lengths[rec] = L;
        ++rec;
        p = resume;
        *consumed = p - buf;
    }
    *norm_used = nw;
    return rec;
}

// Gather selected record slices into one output buffer.
// sel: int64 indices of records; offsets as produced by rd_parse_fastq.
// Returns total bytes written (caller sizes dst via rd_selection_size).
int64_t rd_gather_records(
    const char* buf, const int64_t* offsets, const int64_t* sel,
    int64_t nsel, char* dst)
{
    char* d = dst;
    for (int64_t k = 0; k < nsel; ++k) {
        int64_t r = sel[k];
        int64_t s = offsets[r * 2];
        int64_t e = offsets[r * 2 + 1];
        memcpy(d, buf + s, static_cast<size_t>(e - s));
        d += (e - s);
    }
    return d - dst;
}

int64_t rd_selection_size(const int64_t* offsets, const int64_t* sel, int64_t nsel) {
    int64_t total = 0;
    for (int64_t k = 0; k < nsel; ++k) {
        int64_t r = sel[k];
        total += offsets[r * 2 + 1] - offsets[r * 2];
    }
    return total;
}

}  // extern "C"
