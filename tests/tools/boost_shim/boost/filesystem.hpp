// Minimal boost::filesystem stand-in: only exists(path-as-string) is
// used by the reference sources.  Test-only shim.
#ifndef TAXTK_SHIM_BOOST_FILESYSTEM_HPP
#define TAXTK_SHIM_BOOST_FILESYSTEM_HPP

#include <string>
#include <sys/stat.h>

namespace boost {
namespace filesystem {

inline bool exists(const std::string& p) {
    struct stat st;
    return ::stat(p.c_str(), &st) == 0;
}

}  // namespace filesystem
}  // namespace boost

#endif
