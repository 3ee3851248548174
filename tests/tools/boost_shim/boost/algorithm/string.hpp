// Minimal boost string algorithms used by the reference's bioboxes
// reader (starts_with, split with is_any_of + token_compress_on).
// Test-only shim; NOT part of the framework.
//
// boost::split semantics mirrored exactly: token_compress_off splits at
// EVERY delimiter ("a\t\tb" -> a,,b); token_compress_on splits at each
// RUN of delimiters, still emitting empty boundary tokens ("\ta" ->
// ,a and "a\t" -> a,).
#ifndef TAXTK_SHIM_BOOST_ALGORITHM_STRING_HPP
#define TAXTK_SHIM_BOOST_ALGORITHM_STRING_HPP

#include <algorithm>  // the real header exposes std::find to includers
#include <string>
#include <vector>

namespace boost {

inline bool starts_with(const std::string& s, const std::string& prefix) {
    return s.compare(0, prefix.size(), prefix) == 0;
}

struct shim_char_set {
    std::string chars;
    bool operator()(char c) const {
        return chars.find(c) != std::string::npos;
    }
};

inline shim_char_set is_any_of(const std::string& chars) {
    return shim_char_set{chars};
}

enum token_compress_mode_t { token_compress_off, token_compress_on };

template <class Seq>
void split(Seq& out, const std::string& s, const shim_char_set& pred,
           token_compress_mode_t compress = token_compress_off) {
    out.clear();
    std::string cur;
    bool in_run = false;
    for (char c : s) {
        if (pred(c)) {
            if (compress == token_compress_off || !in_run) {
                out.push_back(cur);
                cur.clear();
            }
            in_run = true;
        } else {
            cur += c;
            in_run = false;
        }
    }
    out.push_back(cur);
}

}  // namespace boost

#endif
