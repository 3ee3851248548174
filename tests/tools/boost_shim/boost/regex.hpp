// Test-only shim: boost::regex over std::regex (alignmentsfilter.hh's
// RemoveIdent*Filter classes and binner.cpp's globbing regex).
// boost::regex::size() returns the expression length (binner.cpp:47
// uses it as an empty-pattern test); std::regex has no such accessor,
// so the shim carries the pattern length.
#ifndef TAXTK_SHIM_BOOST_REGEX_HPP
#define TAXTK_SHIM_BOOST_REGEX_HPP

#include <cstddef>
#include <regex>
#include <string>

namespace boost {

class regex : public std::regex {
public:
    regex() : std::regex(), size_(0) {}
    explicit regex(const std::string& pattern)
        : std::regex(pattern), size_(pattern.size()) {}
    regex(const char* pattern)
        : std::regex(pattern), size_(std::string(pattern).size()) {}
    std::size_t size() const { return size_; }

private:
    std::size_t size_;
};

using cmatch = std::cmatch;
using smatch = std::smatch;
using std::regex_match;
using std::regex_search;

}  // namespace boost

#endif
