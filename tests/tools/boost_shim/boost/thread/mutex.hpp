// Minimal boost::mutex stand-in over std::mutex (sequencestorage.hh uses
// boost::mutex + scoped_lock only).  Test-only shim.
#ifndef TAXTK_SHIM_BOOST_THREAD_MUTEX_HPP
#define TAXTK_SHIM_BOOST_THREAD_MUTEX_HPP

#include <mutex>

namespace boost {

class mutex : public std::mutex {
public:
    using scoped_lock = std::lock_guard<std::mutex>;
};

}  // namespace boost

#endif
